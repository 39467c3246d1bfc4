# fish tab completion for samtools_tpu — subcommand names then files
# (capability analog of misc/samtools_tab_completion.fish).
set -l __stpu_cmds view sort index mpileup depth flagstat idxstats stats \
    consensus merge markdup fixmate collate fastq fasta faidx fqidx dict \
    calmd reheader cat split addreplacerg quickcheck head samples reset \
    depad flags tview bedcov coverage cram-size phase targetcut rmdup \
    checksum ampliconclip ampliconstats import reference wgsim md5fa \
    md5sum-lite seq_cache_populate ace2sam maq2sam bowtie2sam psl2sam \
    soap2sam zoom2sam novo2sam export2sam fasta-sanitize plot-bamstats \
    plot-ampliconstats

complete -c samtools_tpu -n "__fish_use_subcommand" -a "$__stpu_cmds"
complete -c samtools-tpu -n "__fish_use_subcommand" -a "$__stpu_cmds"
