"""Session-factory policy helpers (pure functions — no SparkSession).

ADVICE r4: the tmpfs local-dir default must not fire on hosts where
/dev/shm is tiny (Docker's 64 MB default). (A host-sized driver-memory
default was tried here and reverted: bigger heaps measurably storm this
kernel — see the get_spark builder comment — so 8g stays fixed with the
SPARK_GRAFT_DRIVER_MEM override.)
"""

import os

import pytest

from registry_address_matcher_spark.session import (
    _local_cluster_shape,
    _local_n,
    _shm_usable,
)


def test_shm_forced_off(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHM_LOCAL_DIR", "0")
    assert _shm_usable() is False


def test_shm_forced_on(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SHM_LOCAL_DIR", "1")
    assert _shm_usable() == os.path.isdir("/dev/shm")


def test_shm_auto_requires_headroom(monkeypatch):
    """Auto mode must check actual free space: a 64 MB tmpfs (the Docker
    default) is rejected, a roomy one accepted."""
    import registry_address_matcher_spark.session as S

    monkeypatch.delenv("SPARK_GRAFT_SHM_LOCAL_DIR", raising=False)

    class FakeStat:
        def __init__(self, avail_bytes):
            self.f_bavail = avail_bytes // 4096
            self.f_frsize = 4096

    monkeypatch.setattr(S.os, "statvfs", lambda p: FakeStat(64 << 20))
    assert S._shm_usable() is False
    monkeypatch.setattr(S.os, "statvfs", lambda p: FakeStat(32 << 30))
    assert S._shm_usable() == os.path.isdir("/dev/shm")


def test_master_parsers():
    assert _local_n("local[8]") == 8
    assert _local_n("local[*]") is None
    assert _local_cluster_shape("local-cluster[4,2,4096]") == (4, 2, 4096)
    assert _local_cluster_shape("local[8]") is None
