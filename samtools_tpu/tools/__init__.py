"""Subcommand registry (reference analog: the dispatch table in
/root/reference/bamtk.c:246-304)."""

from __future__ import annotations

import importlib

# subcommand -> (module, function) resolved lazily so the CLI starts fast
COMMANDS = {
    "view": ("samtools_tpu.tools.view_cmd", "main_view"),
    "head": ("samtools_tpu.tools.head_cmd", "main_head"),
    "flags": ("samtools_tpu.tools.flags_cmd", "main_flags"),
    "quickcheck": ("samtools_tpu.tools.quickcheck_cmd", "main_quickcheck"),
    "cat": ("samtools_tpu.tools.cat_cmd", "main_cat"),
    "flagstat": ("samtools_tpu.tools.flagstat_cmd", "main_flagstat"),
    "idxstats": ("samtools_tpu.tools.idxstats_cmd", "main_idxstats"),
    "index": ("samtools_tpu.tools.index_cmd", "main_index"),
    "depth": ("samtools_tpu.tools.depth_cmd", "main_depth"),
    "mpileup": ("samtools_tpu.tools.mpileup_cmd", "main_mpileup"),
    "sort": ("samtools_tpu.tools.sort_cmd", "main_sort"),
    "merge": ("samtools_tpu.tools.merge_cmd", "main_merge"),
    "collate": ("samtools_tpu.tools.collate_cmd", "main_collate"),
    "fixmate": ("samtools_tpu.tools.fixmate_cmd", "main_fixmate"),
    "markdup": ("samtools_tpu.tools.markdup_cmd", "main_markdup"),
    "faidx": ("samtools_tpu.tools.faidx_cmd", "main_faidx"),
    "fqidx": ("samtools_tpu.tools.faidx_cmd", "main_fqidx"),
    "dict": ("samtools_tpu.tools.dict_cmd", "main_dict"),
    "stats": ("samtools_tpu.tools.stats_cmd", "main_stats"),
    "coverage": ("samtools_tpu.tools.coverage_cmd", "main_coverage"),
    "bedcov": ("samtools_tpu.tools.bedcov_cmd", "main_bedcov"),
    "consensus": ("samtools_tpu.tools.consensus_cmd", "main_consensus"),
    "fastq": ("samtools_tpu.tools.fastq_cmd", "main_fastq"),
    "fasta": ("samtools_tpu.tools.fastq_cmd", "main_fasta"),
    "import": ("samtools_tpu.tools.import_cmd", "main_import"),
    "split": ("samtools_tpu.tools.split_cmd", "main_split"),
    "addreplacerg": ("samtools_tpu.tools.addrprg_cmd", "main_addreplacerg"),
    "reheader": ("samtools_tpu.tools.reheader_cmd", "main_reheader"),
    "calmd": ("samtools_tpu.tools.calmd_cmd", "main_calmd"),
    "fillmd": ("samtools_tpu.tools.calmd_cmd", "main_calmd"),
    "checksum": ("samtools_tpu.tools.checksum_cmd", "main_checksum"),
    "samples": ("samtools_tpu.tools.samples_cmd", "main_samples"),
    "reset": ("samtools_tpu.tools.reset_cmd", "main_reset"),
    "ampliconclip": ("samtools_tpu.tools.ampliconclip_cmd", "main_ampliconclip"),
    "ampliconstats": ("samtools_tpu.tools.ampliconstats_cmd", "main_ampliconstats"),
    "depad": ("samtools_tpu.tools.depad_cmd", "main_depad"),
    "phase": ("samtools_tpu.tools.phase_cmd", "main_phase"),
    "targetcut": ("samtools_tpu.tools.targetcut_cmd", "main_targetcut"),
    "rmdup": ("samtools_tpu.tools.rmdup_cmd", "main_rmdup"),
    "tview": ("samtools_tpu.tools.tview_cmd", "main_tview"),
    "reference": ("samtools_tpu.tools.reference_cmd", "main_reference"),
    "cram-size": ("samtools_tpu.tools.cram_size_cmd", "main_cram_size"),
    # ancillary (reference misc/ binaries, not bamtk subcommands)
    "wgsim": ("samtools_tpu.tools.wgsim_cmd", "main_wgsim"),
    "md5fa": ("samtools_tpu.tools.misc_cmds", "main_md5fa"),
    "plot-bamstats": ("samtools_tpu.tools.plot_bamstats_cmd",
                      "main_plot_bamstats"),
    "plot-ampliconstats": ("samtools_tpu.tools.plot_ampliconstats_cmd",
                           "main_plot_ampliconstats"),
    "md5sum-lite": ("samtools_tpu.tools.misc_cmds", "main_md5sum_lite"),
    "seq_cache_populate": ("samtools_tpu.tools.misc_cmds",
                           "main_seq_cache_populate"),
    "ace2sam": ("samtools_tpu.tools.ace2sam_cmd", "main_ace2sam"),
    "maq2sam": ("samtools_tpu.tools.convert_cmds", "main_maq2sam"),
    "bowtie2sam": ("samtools_tpu.tools.convert_cmds", "main_bowtie2sam"),
    "psl2sam": ("samtools_tpu.tools.convert_cmds", "main_psl2sam"),
    "soap2sam": ("samtools_tpu.tools.convert_cmds", "main_soap2sam"),
    "zoom2sam": ("samtools_tpu.tools.convert_cmds", "main_zoom2sam"),
    "novo2sam": ("samtools_tpu.tools.convert_cmds", "main_novo2sam"),
    "export2sam": ("samtools_tpu.tools.convert_cmds", "main_export2sam"),
    "fasta-sanitize": ("samtools_tpu.tools.convert_cmds",
                       "main_fasta_sanitize"),
    "blast2sam": ("samtools_tpu.tools.convert_cmds", "main_blast2sam"),
    "interpolate_sam": ("samtools_tpu.tools.convert_cmds",
                        "main_interpolate_sam"),
    "wgsim_eval": ("samtools_tpu.tools.wgsim_eval_cmd",
                   "main_wgsim_eval"),
}


def run_command(name: str, argv: list[str]) -> int:
    mod_name, fn_name = COMMANDS[name]
    mod = importlib.import_module(mod_name)
    return getattr(mod, fn_name)(argv)
