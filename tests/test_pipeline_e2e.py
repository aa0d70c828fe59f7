"""End-to-end: pairwise F1 >= 0.99 vs labeled ground truth on the seeded
synthetic registry pair, plus schema and invariant checks."""

from registry_address_matcher_spark.pipeline import run_match_pipeline
from registry_address_matcher_spark.operators.exact import MATCH_COLUMNS


def test_pipeline_f1(spark, registry_fixture):
    spr, cad, labels = registry_fixture
    res = run_match_pipeline(spr, cad, with_clusters=True)
    got = res.matches.select("ADDRESS_ID_SPR", "ADDRESS_ID_CAD").toPandas()
    predicted = set(zip(got.ADDRESS_ID_SPR, got.ADDRESS_ID_CAD))

    lab = labels.toPandas()
    truth = set(zip(lab[lab.is_match].spr_id, lab[lab.is_match].cad_id))
    labeled_neg = set(zip(lab[~lab.is_match].spr_id, lab[~lab.is_match].cad_id))

    tp = len(predicted & truth)
    fn = len(truth - predicted)
    fp_labeled = len(predicted & labeled_neg)
    # precision over labeled pairs; unlabeled predictions (e.g. a corrupted
    # SPR row legitimately matching a different CAD entity with identical
    # block+street) are not counted against precision
    precision = tp / (tp + fp_labeled) if tp + fp_labeled else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall)
    assert f1 >= 0.99, f"F1={f1:.4f} (P={precision:.4f}, R={recall:.4f}, tp={tp}, fn={fn}, fp={fp_labeled})"


def test_match_schema(spark, registry_fixture):
    spr, cad, _ = registry_fixture
    res = run_match_pipeline(spr, cad, with_clusters=False)
    assert res.matches.columns == MATCH_COLUMNS
    pdf = res.matches.limit(50).toPandas()
    assert ((pdf.MATCH_SCORE >= 0) & (pdf.MATCH_SCORE <= 100)).all()
    assert set(pdf.MATCH_TYPE) <= {
        "EXACT_FULL", "EXACT_KEY",
        "FUZZY_STREET_RATIO", "FUZZY_STREET_PARTIAL_RATIO",
        "FUZZY_STREET_TOKEN_SORT_RATIO", "FUZZY_STREET_TOKEN_SET_RATIO",
    }


def test_unmatched_partition(spark, registry_fixture):
    spr, cad, _ = registry_fixture
    res = run_match_pipeline(spr, cad, with_clusters=False)
    n_spr = spr.count()
    matched_ids = res.matches.select("ADDRESS_ID_SPR").distinct().count()
    assert res.unmatched_spr.count() == n_spr - matched_ids


def test_clusters_cover_all_matched_nodes(spark, registry_fixture):
    spr, cad, _ = registry_fixture
    res = run_match_pipeline(spr, cad, with_clusters=True)
    n_nodes = (
        res.matches.select("ADDRESS_ID_SPR").distinct().count()
        + res.matches.select("ADDRESS_ID_CAD").distinct().count()
    )
    assert res.clusters.count() == n_nodes
