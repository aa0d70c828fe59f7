"""Export sinks (reference S5/S6/S7).

``create_export_package`` mirrors ``src/utils/export.py:6-45``: matched
CSV + unmatched CSV + quality/statistics JSON members, zipped. Table
payloads are written distributed (Spark CSV writers); only the small
aggregate JSONs are collected to the driver. The zip step is driver-side
by nature (one archive file) — at real scale you ship the directory, the
zip exists for reference-parity of the export surface.

``summary_report_markdown`` mirrors the f-string report at
``main.py:898-928``.
"""

from __future__ import annotations

import glob
import json
import os
import zipfile

from pyspark.sql import DataFrame

from ..plans.quality import match_quality, match_type_counts, registry_quality


def _collect_one(df: DataFrame) -> dict:
    row = df.collect()[0]
    return {k: (None if v is None else float(v)) for k, v in row.asDict().items()}


def create_export_package(
    out_dir: str,
    matches: DataFrame,
    unmatched_spr: DataFrame,
    spr_preprocessed: DataFrame,
    zip_path: str | None = None,
) -> str:
    """Write the package directory; optionally zip it. Returns the dir."""
    os.makedirs(out_dir, exist_ok=True)
    matches.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "matched_addresses")
    )
    unmatched_spr.write.mode("overwrite").option("header", True).csv(
        os.path.join(out_dir, "unmatched_spr_addresses")
    )
    quality = _collect_one(registry_quality(spr_preprocessed))
    stats = _collect_one(match_quality(matches))
    stats["by_type"] = {
        r["MATCH_TYPE"]: r["n"] for r in match_type_counts(matches).collect()
    }
    with open(os.path.join(out_dir, "quality_report.json"), "w") as f:
        json.dump(quality, f, indent=1)
    with open(os.path.join(out_dir, "matching_statistics.json"), "w") as f:
        json.dump(stats, f, indent=1)
    if zip_path:
        with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
            for p in glob.glob(os.path.join(out_dir, "**"), recursive=True):
                if os.path.isfile(p):
                    zf.write(p, os.path.relpath(p, out_dir))
    return out_dir


def summary_report_markdown(matches: DataFrame, spr_total: int) -> str:
    """S7: small driver-side markdown summary (reporting, not engine)."""
    stats = _collect_one(match_quality(matches))
    by_type = {r["MATCH_TYPE"]: r["n"] for r in match_type_counts(matches).collect()}
    matched = int(stats["total_matches"])
    lines = [
        "# Matching summary",
        "",
        f"- SPR records: {spr_total}",
        f"- Matched: {matched} ({matched / spr_total:.1%})" if spr_total else "- Matched: 0",
        f"- Mean score: {stats['score_mean']:.2f}",
        f"- Median score: {stats['score_median']:.2f}",
        "",
        "## By match type",
        "",
    ]
    for t, n in sorted(by_type.items()):
        lines.append(f"- {t}: {int(n)}")
    return "\n".join(lines)
