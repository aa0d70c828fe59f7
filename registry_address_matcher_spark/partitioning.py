"""Partition-count policy for CPU-bound stages.

Two rules, both measured on this engine's hot stages:

1. **Constant partition SIZE across cluster sizes.** A cores-derived
   count (e.g. 4 x cores) changes the Arrow batch shape when the cluster
   grows — per-pair kernel efficiency shifts under the measurement and
   throughput stops scaling with cores (round-2 regression).
2. **Whole scheduling waves.** CPU-bound tasks run in waves of ``cores``;
   a ragged last wave leaves cores idle for one full partition runtime.
   Measured on the identical 10.2M-pair scoring job at 8 cores:
   32 partitions (4 even waves) 33.1 s, 41 partitions (5 waves + 1 task)
   45.3 s.
"""

from __future__ import annotations


def cpu_stage_partitions(
    n_items: int, items_per_partition: int, cores: int, cap: int = 65536
) -> int:
    """ceil(n_items / items_per_partition), rounded UP to a multiple of
    ``cores``, clamped to [cores, cap]."""
    base = max(-(-n_items // items_per_partition), 1)
    waves = -(-base // cores)
    return max(cores, min(waves * cores, cap))
