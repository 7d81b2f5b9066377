"""bwamem2_tpu — a TPU-native short-read aligner with the capabilities of bwa-mem2.

This is a from-scratch reimplementation of the BWA-MEM seed-and-extend
algorithm designed for TPUs: the FM-index lives in HBM as gather-friendly
arrays, SMEM enumeration / suffix-array lookup / banded Smith-Waterman run as
batched JAX/Pallas array programs over fixed-shape read tiles, and the
host-side runtime (chaining, SAM finalization, FASTQ/SAM I/O, CIGAR traceback)
runs in C++/NumPy.  Multi-chip scaling is data-parallel over a
`jax.sharding.Mesh` (reads sharded, index replicated).

Reference behavior spec: bwa-mem2 v2.2.1 (see SURVEY.md for the layer map).

JAX is imported lazily (only by the device-kernel modules under
`bwamem2_tpu.ops` / `bwamem2_tpu.parallel`) so index building, host oracle,
and I/O work without touching an accelerator.
"""

from .options import MemOptions  # noqa: F401

__version__ = "0.1.0"
