# bash tab completion for samtools_tpu (`python -m samtools_tpu ...`).
# Completes subcommand names, then falls back to filename completion —
# the capability analog of misc/samtools_tab_completion.bash.
#
# Install: source this file from ~/.bashrc, or drop it into
# /etc/bash_completion.d/.

_samtools_tpu_subcommands()
{
    python - <<'PY' 2>/dev/null
import sys
sys.path.insert(0, "")
try:
    from samtools_tpu.tools import COMMANDS
    print(" ".join(sorted(COMMANDS)))
except Exception:
    pass
PY
}

_samtools_tpu()
{
    local cur prev subcommands
    COMPREPLY=()
    cur="${COMP_WORDS[COMP_CWORD]}"
    prev="${COMP_WORDS[COMP_CWORD-1]}"

    # complete the subcommand right after the tool name / `-m samtools_tpu`
    if [[ "$prev" == "samtools_tpu" || "$prev" == "samtools-tpu" ]]; then
        subcommands="$(_samtools_tpu_subcommands)"
        if [[ -z "$subcommands" ]]; then
            subcommands="view sort index mpileup depth flagstat idxstats \
stats consensus merge markdup fixmate collate fastq fasta faidx fqidx dict \
calmd reheader cat split addreplacerg quickcheck head samples reset depad \
flags tview bedcov coverage cram-size phase targetcut rmdup checksum \
ampliconclip ampliconstats import reference wgsim md5fa md5sum-lite \
seq_cache_populate ace2sam maq2sam bowtie2sam psl2sam soap2sam zoom2sam \
novo2sam export2sam fasta-sanitize plot-bamstats plot-ampliconstats"
        fi
        COMPREPLY=( $(compgen -W "$subcommands" -- "$cur") )
        return 0
    fi

    # long options trigger on a typed '-'; otherwise filenames
    if [[ "$cur" == -* ]]; then
        COMPREPLY=( $(compgen -W "--help --version --input-fmt \
--input-fmt-option --output-fmt --output-fmt-option --reference \
--threads --write-index --verbosity" -- "$cur") )
        return 0
    fi
    COMPREPLY=( $(compgen -f -- "$cur") )
}

complete -F _samtools_tpu samtools_tpu samtools-tpu
