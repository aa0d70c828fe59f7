"""Registry preprocessing (reference ``preprocess_registries``).

Reproduces ``/root/reference/src/utils/preprocessing.py:10-53`` — derives
``STREET_NORM / HOUSE_NORM / BUILDING_NORM / FULL_ADDRESS / SEARCH_KEY /
COMPLETENESS_SCORE`` — as a single narrow projection over native
expressions. One pass, no shuffle, fully codegen'd; Catalyst prunes any
passthrough columns the downstream plan doesn't use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.normalize import (
    completeness_col,
    full_address_col,
    normalize_col,
    search_key_col,
)

REQUIRED_COLUMNS = ("STREET_NAME", "HOUSE", "BUILDING")


def validate_registry(df: DataFrame) -> None:
    """Presence check only, like the reference (data_loader.py:16-21)."""
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"registry missing required columns: {missing}")


def ensure_address_id(df: DataFrame) -> DataFrame:
    """The reference falls back to the pandas row index when ADDRESS_ID is
    absent (advanced_matcher.py:187). A row index is not stable under
    repartitioning, so the Spark engine derives a deterministic surrogate:
    sha256 over the raw address columns. Identical raw rows collapse to the
    same id — acceptable for linkage (they are indistinguishable records)
    and stable across runs/partitionings, which the checkpoint/resume path
    requires.
    """
    if "ADDRESS_ID" in df.columns:
        return df.withColumn("ADDRESS_ID", F.col("ADDRESS_ID").cast("string"))
    return df.withColumn(
        "ADDRESS_ID",
        F.sha2(
            F.concat_ws(
                "\x1f",
                *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in REQUIRED_COLUMNS],
            ),
            256,
        ),
    )


def preprocess_registry(df: DataFrame) -> DataFrame:
    """Add the six derived columns (P1-P6)."""
    validate_registry(df)
    df = ensure_address_id(df)
    df = (
        df.withColumn("STREET_NORM", normalize_col(F.col("STREET_NAME")))
        .withColumn("HOUSE_NORM", normalize_col(F.col("HOUSE")))
        .withColumn("BUILDING_NORM", normalize_col(F.col("BUILDING")))
    )
    df = df.withColumn(
        "FULL_ADDRESS",
        full_address_col(F.col("STREET_NORM"), F.col("HOUSE_NORM"), F.col("BUILDING_NORM")),
    ).withColumn(
        "SEARCH_KEY", search_key_col(F.col("STREET_NORM"), F.col("HOUSE_NORM"))
    ).withColumn(
        "COMPLETENESS_SCORE",
        completeness_col(F.col("STREET_NAME"), F.col("HOUSE"), F.col("BUILDING")),
    )
    return df
