"""samtools_tpu — a TPU-native reimplementation of the samtools toolkit.

Architecture (brand-new, idiomatic TPU — not a port):

* ``samtools_tpu.io``    — host-side I/O: BGZF codec, BAM/SAM decode into
  structure-of-arrays :class:`~samtools_tpu.core.batch.ReadBatch` columnar
  batches, FASTA/FAI, BED, BAI/CSI indexes.  (Reference analog: htslib.)
* ``samtools_tpu.core``  — columnar record model, flag constants, sanitize.
* ``samtools_tpu.ops``   — JAX/Pallas device kernels: pileup segment-scatter,
  depth, flagstat census, consensus Bayesian scorer, BAQ pair-HMM, stats
  histograms, sort keys.
* ``samtools_tpu.parallel`` — jax.sharding Mesh helpers, genomic region
  sharding with halo exchange, collective merges.
* ``samtools_tpu.tools`` — one module per subcommand with samtools-compatible
  CLI flags and byte-identical output (reference: bamtk.c's dispatch table).

Reference for capability parity: samtools 1.23.1 (/root/reference).
"""

__version__ = "0.1.0"

SAMTOOLS_PARITY_VERSION = "1.23.1"
