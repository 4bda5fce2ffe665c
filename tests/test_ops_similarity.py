import pytest

from flink_210225_spark.ops import similarity

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", ["sim_cosine_topk", "sim_cluster_stats"])
def test_similarity_matches_oracle(name, tables):
    assert_matches_oracle(similarity.QUERIES[name](tables), similarity.ORACLES[name], SF_DIR)


def test_lsh_ann_recall(tables):
    """ANN top-5 must recover most of the exact top-5 (multi-probe, 8 bits)."""
    exact = {
        (r.query_id, r.neighbor_id) for r in similarity.cosine_topk(tables).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in similarity.lsh_ann_topk(tables).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ANN recall too low: {recall:.2f}"


def test_ivf_ann_recall(tables):
    """IVF-Flat with 4/16 cells probed must recover most of the exact top-5,
    and probing ALL cells must equal the exact result (IVF-Flat is exact
    within probed cells)."""
    exact = {
        (r.query_id, r.neighbor_id) for r in similarity.cosine_topk(tables).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in similarity.ivf_ann_topk(tables).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall:.2f}"

    full = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivf_ann_topk(tables, n_cells=16, n_probe=16).collect()
    }
    assert full == exact, "probing every cell must reproduce the exact top-k"
