import pytest

from flink_210225_spark.ops import similarity

from .conftest import SF_DIR
from .oracle import assert_matches_oracle


@pytest.mark.parametrize(
    "name", ["sim_cosine_topk", "sim_cluster_stats", "sim_quantize_int8", "sim_pq_audit", "sim_coreset_audit", "sim_matryoshka_audit", "sim_binary_hamming_topk", "sim_outlier_zscore"]
)
def test_similarity_matches_oracle(name, tables):
    assert_matches_oracle(similarity.QUERIES[name](tables), similarity.ORACLES[name], SF_DIR)


def test_quantize_int8_reconstruction(tables):
    """Quantized values stay in int8 range and dequantization error is
    bounded by scale/2 = maxabs/254 per component."""
    rows = similarity.quantize_int8(tables).collect()
    assert all(-127 <= r.qv <= 127 for r in rows)
    # err was rounded half-up at 1e-6, allow that much slack on the bound
    assert all(r.err <= r.maxabs / 254 + 1e-6 for r in rows)


def test_semantic_dedup_recall_and_purity(tables):
    """Cluster-scoped pairs must be a subset of the global near-dup pairs
    (same threshold, same rounding) with soft-assignment recall ≥ 0.95."""
    from flink_210225_spark.ops.dedup import embedding_near_dups

    glob = {(r.vec_a, r.vec_b): r.cosine for r in embedding_near_dups(tables).collect()}
    sem = {(r.vec_a, r.vec_b): r.cosine for r in similarity.semantic_dedup(tables).collect()}
    assert not set(sem) - set(glob), "semantic dedup emitted non-near-dup pairs"
    assert len(sem) / len(glob) >= 0.95, f"recall {len(sem) / len(glob):.2f}"
    assert all(abs(glob[p] - sem[p]) < 1e-6 for p in sem), "cosine mismatch vs global"


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


def test_semantic_groups_match_union_find(tables):
    """Component labels must equal a driver-side union-find closure over the
    same semantic pair set (min reachable id), with isolated vectors
    labeling themselves."""
    pairs = [(r.vec_a, r.vec_b) for r in similarity.semantic_dedup(tables).collect()]
    got = {r.vec_id: r.component for r in similarity.semantic_dedup_groups(tables).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-reachable == union-find root because unions always root at the
    # smaller id (union by min)
    want = {v: (find(v) if v in parent else v) for v in got}
    assert got == want


def test_coreset_k_caps(tables):
    """VERDICT r1 #8: FPS is k sequential driver rounds — out-of-range k
    must be rejected up front with the scale guidance, not ground through."""
    import pytest

    with pytest.raises(ValueError, match="diversity_coreset_cached"):
        similarity.diversity_coreset(tables, k=1001)
    with pytest.raises(ValueError, match="per-cell FPS"):
        similarity.diversity_coreset_cached(tables, k=10_001)


def test_coreset_cached_matches_full_rescore(tables):
    """The O(n·dim)-per-round cached-min-distance variant must reproduce the
    full-rescore pick sequence exactly (ids) with matching radii."""
    full = similarity.diversity_coreset(tables).orderBy("pick_order").collect()
    cached = similarity.diversity_coreset_cached(tables).orderBy("pick_order").collect()
    assert [r.vec_id for r in full] == [r.vec_id for r in cached]
    for a, b in zip(full, cached):
        if a.mindist is not None:
            assert abs(a.mindist - b.mindist) < 1e-9


def test_diversity_coreset_matches_numpy_greedy(tables):
    """The distributed farthest-point run must pick the IDENTICAL sequence a
    single-machine NumPy greedy picks — partition-local argmax + driver
    reduce is a pure reformulation, not an approximation."""
    import numpy as np

    k = 8
    got = sorted(
        similarity.diversity_coreset(tables, k=k).collect(),
        key=lambda r: r.pick_order,
    )

    pdf = tables["embeddings"].select("vec_id", "embedding").toPandas()
    pdf = pdf.sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    nrm = np.sqrt((mat * mat).sum(axis=1))
    want = [int(ids[0])]
    mind = np.full(len(ids), np.inf)
    for _ in range(1, k):
        c = mat[np.where(ids == want[-1])[0][0]]
        d = 1.0 - (mat @ c) / (nrm * np.sqrt(c @ c))
        mind = np.minimum(mind, d)
        best = np.lexsort((ids, -mind))[0]
        want.append(int(ids[best]))

    assert [r.vec_id for r in got] == want
    radii = [r.mindist for r in got[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), "coverage radius must shrink"


def test_pq_codes_numpy_parity_and_compression(tables):
    """Spark's PQ codes/MSE must equal a straight NumPy recompute from the
    returned codebook; coding must beat the k=1 (per-subspace mean)
    baseline, i.e. the codebook actually learned structure; and the whole
    pipeline is deterministic across runs."""
    import numpy as np

    emb = tables["embeddings"].select("vec_id", "embedding")
    codes_df, cb = similarity.pq_train(emb)
    got = {r.vec_id: (list(r.codes), r.recon_mse) for r in codes_df.collect()}

    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    m, k, d_sub = cb.shape
    sub = mat.reshape(len(mat), m, d_sub)
    err = np.zeros(len(mat))
    for j in range(m):
        d2 = ((sub[:, j, None, :] - cb[j][None, :, :]) ** 2).sum(-1)
        want_codes = d2.argmin(axis=1)
        assert [got[int(i)][0][j] for i in ids] == list(want_codes)
        err += d2.min(axis=1)
    want_mse = err / mat.shape[1]
    np.testing.assert_allclose(
        [got[int(i)][1] for i in ids], want_mse, rtol=1e-9
    )

    # beat the per-subspace-mean (k=1) baseline
    base_err = np.zeros(len(mat))
    for j in range(m):
        mu = sub[:, j, :].mean(axis=0)
        base_err += ((sub[:, j, :] - mu) ** 2).sum(-1)
    assert want_mse.mean() < (base_err / mat.shape[1]).mean() * 0.9

    # determinism
    again = {r.vec_id: (list(r.codes), r.recon_mse)
             for r in similarity.pq_train(emb)[0].collect()}
    assert again == got

    # codes in range
    flat = [c for codes, _ in got.values() for c in codes]
    assert min(flat) >= 0 and max(flat) < k


def test_embed_dim_stats_matches_oracle(tables):
    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        similarity.QUERIES["sim_embed_dim_stats"](tables),
        similarity.ORACLES["sim_embed_dim_stats"],
        SF_DIR,
    )


def test_embed_dim_stats_semantics(spark):
    from flink_210225_spark.ops import similarity as sim

    emb = spark.createDataFrame(
        [(1, [1.0, -2.0], 0), (2, [3.0, 4.0], 0), (3, [5.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {r.dim: r for r in sim.embed_dim_stats({"embeddings": emb}).collect()}
    assert rows[0].n == 3 and rows[0].mean_x == 3.0
    assert rows[0].min_x == 1.0 and rows[0].max_x == 5.0
    assert rows[1].mean_x == abs(rows[1].mean_x)  # (−2+4+0)/3 = 2/3 > 0
    assert abs(rows[1].mean_x - round(2 / 3, 6)) < 2e-6


def test_whiten_zscore_matches_oracle(tables):
    assert_matches_oracle(
        similarity.QUERIES["sim_whiten_zscore"](tables),
        similarity.ORACLES["sim_whiten_zscore"],
        SF_DIR,
    )


def test_whiten_zscore_semantics(spark):
    """Two vectors → per-dim mean is the midpoint, z = ±1 for pop-stddev of
    a two-point set; a constant dimension maps to z = 0."""
    emb = spark.createDataFrame(
        [(1, [0.0, 5.0], 0), (2, [2.0, 5.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = {(r.vec_id, r.dim): r.z for r in similarity.whiten_embeddings({"embeddings": emb}).collect()}
    assert rows[(1, 0)] == -1.0 and rows[(2, 0)] == 1.0
    assert rows[(1, 1)] == 0.0 and rows[(2, 1)] == 0.0


def test_ivfpq_matches_numpy_reference(tables):
    """End-to-end IVFPQ parity: an independent NumPy implementation fed the
    SAME coarse centroids and codebook must produce the same top-k per query
    (probes, codes, ADC sums and tie-breaks all replicated)."""
    import numpy as np

    emb = tables["embeddings"]
    num_q, k, n_cells, n_probe, m, k_codes = 20, 5, 16, 4, 8, 16
    got = {
        (r.query_id, r.rank): (r.neighbor_id, r.approx_d)
        for r in similarity.ivf_pq_ann_topk(tables).collect()
    }

    assigned, coarse = similarity.ivf_assign(emb, n_cells)
    codes_df, cb = similarity.pq_train(emb, m=m, k=k_codes)
    cell_of = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    codes = {r.vec_id: list(r.codes) for r in codes_df.select("vec_id", "codes").collect()}
    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = {int(v): np.array(e, dtype=np.float64) for v, e in zip(pdf["vec_id"], pdf["embedding"])}
    dim = cb.shape[0] * cb.shape[2]
    d_sub = cb.shape[2]

    refine = 4
    want = {}
    for qid in range(num_q):
        q = vecs[qid]
        d2c = ((q[None, :] - coarse) ** 2).sum(-1)
        probe = set(int(c) for c in np.argsort(d2c)[:n_probe])
        tab = ((q.reshape(m, 1, d_sub) - cb) ** 2).sum(-1)  # (m, k_codes)
        cands = []
        for nid, cell in cell_of.items():
            if nid == qid or cell not in probe:
                continue
            d = sum(tab[j, codes[nid][j]] for j in range(m))
            cands.append((np.floor(d / dim * 1e6 + 0.5) / 1e6, nid))
        cands.sort(key=lambda t: (t[0], t[1]))
        short = [nid for _, nid in cands[: k * refine]]
        rer = sorted(
            (np.floor(((vecs[nid] - q) ** 2).sum() / dim * 1e6 + 0.5) / 1e6, nid)
            for nid in short
        )
        for rank, (d, nid) in enumerate(rer[:k], 1):
            want[(qid, rank)] = nid
    assert set(got) == set(want)
    for key, nid in want.items():
        assert got[key][0] == nid, (key, got[key], nid)


def test_ivfpq_recall_vs_exact_l2(tables):
    """Probe-bounded PQ search must still recover a solid share of the true
    L2 top-5 on the fixture corpus."""
    import numpy as np

    emb = tables["embeddings"]
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    got = {}
    for r in similarity.ivf_pq_ann_topk(tables).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = total = 0
    for qid in range(20):
        q = mat[ids == qid][0]
        d = ((mat - q) ** 2).sum(1)
        order = [int(i) for i in ids[np.argsort(d, kind="stable")] if i != qid][:5]
        hits += len(set(order) & got.get(qid, set()))
        total += 5
    assert hits / total >= 0.5, hits / total


def test_centroid_pairs_matches_oracle(tables):
    assert_matches_oracle(
        similarity.QUERIES["sim_centroid_pairs"](tables),
        similarity.ORACLES["sim_centroid_pairs"],
        SF_DIR,
    )


def test_centroid_pairs_geometry(spark):
    """Two labels along +x and +y axes → centroid cosine 0; identical
    clusters → cosine 1."""
    rows = [
        (1, [1.0, 0.0], 0), (2, [3.0, 0.0], 0),
        (3, [0.0, 2.0], 1), (4, [0.0, 5.0], 1),
        (5, [1.0, 0.0], 2), (6, [3.0, 0.0], 2),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {(r.label_a, r.label_b): r.cosine for r in similarity.centroid_pairs({"embeddings": emb}).collect()}
    assert got[(0, 1)] == 0.0
    assert got[(0, 2)] == 1.0
    assert got[(1, 2)] == 0.0


def test_knn_label_matches_oracle(tables):
    assert_matches_oracle(
        similarity.QUERIES["sim_knn_label"](tables),
        similarity.ORACLES["sim_knn_label"],
        SF_DIR,
    )


def test_knn_label_vote_semantics(tables):
    """Votes must sum to k per query, the winner must hold a plurality, and
    predictions must match a hand vote over the top-k table."""
    topk = similarity.cosine_topk(tables).collect()
    labels = {r.vec_id: r.label for r in tables["embeddings"].select("vec_id", "label").collect()}
    votes = {}
    for r in topk:
        votes.setdefault(r.query_id, []).append(labels[r.neighbor_id])
    got = {r.query_id: r for r in similarity.knn_label_predict(tables).collect()}
    for qid, ls in votes.items():
        from collections import Counter

        c = Counter(ls)
        best = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[qid].pred_label == best[0]
        assert got[qid].vote_ct == best[1]
        assert got[qid].true_label == labels[qid]


def test_residual_coding_reduces_mse(tables):
    """Residual PQ must reconstruct better than raw-vector PQ: the coarse
    centroid absorbs the between-cell variance, leaving the codebook only
    the within-cell geometry."""
    emb = tables["embeddings"]
    assigned, coarse = similarity.ivf_assign(emb, 16)
    raw_codes, _ = similarity.pq_train(emb.select("vec_id", "embedding"))
    res = similarity.residual_vectors(assigned, coarse)
    res_codes, _ = similarity.pq_train(res.select("vec_id", "embedding"))
    raw_mse = sum(r.recon_mse for r in raw_codes.collect())
    res_mse = sum(r.recon_mse for r in res_codes.collect())
    assert res_mse < raw_mse * 0.9, (res_mse, raw_mse)


def test_ivfpq_residual_recall_not_worse(tables):
    """Residual-coded search must recall at least as much of the true L2
    top-5 as the raw-coded variant (both share probes and the exact
    re-rank; the residual ADC shortlist is strictly better informed)."""
    import numpy as np

    emb = tables["embeddings"]
    pdf = emb.select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)

    def recall(fn):
        got = {}
        for r in fn(tables).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        hits = 0
        for qid in range(20):
            q = mat[ids == qid][0]
            d = ((mat - q) ** 2).sum(1)
            order = [int(i) for i in ids[np.argsort(d, kind="stable")] if i != qid][:5]
            hits += len(set(order) & got.get(qid, set()))
        return hits / 100

    r_res = recall(similarity.ivf_pq_residual_ann_topk)
    r_raw = recall(similarity.ivf_pq_ann_topk)
    assert r_res >= r_raw - 0.05, (r_res, r_raw)
    assert r_res >= 0.5, r_res


def test_ivfpq_residual_matches_numpy_reference(tables):
    """End-to-end residual-IVFPQ parity: an independent NumPy implementation
    fed the same coarse centroids and residual codebook must produce the
    same top-k (probes, residual tables, ADC, shortlist, exact re-rank)."""
    import numpy as np

    emb = tables["embeddings"]
    num_q, k, n_cells, n_probe, m, k_codes, refine = 20, 5, 16, 4, 8, 16, 4
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in similarity.ivf_pq_residual_ann_topk(tables).collect()
    }

    assigned, coarse = similarity.ivf_assign(emb, n_cells)
    res = similarity.residual_vectors(assigned, coarse)
    codes_df, cb = similarity.pq_train(res.select("vec_id", "embedding"), m=m, k=k_codes)
    cell_of = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    codes = {r.vec_id: list(r.codes) for r in codes_df.select("vec_id", "codes").collect()}
    pdf = emb.select("vec_id", "embedding").toPandas()
    vecs = {int(v): np.array(e, dtype=np.float64) for v, e in zip(pdf["vec_id"], pdf["embedding"])}
    dim = cb.shape[0] * cb.shape[2]
    d_sub = cb.shape[2]

    want = {}
    for qid in range(num_q):
        q = vecs[qid]
        d2c = ((q[None, :] - coarse) ** 2).sum(-1)
        probe = [int(c) for c in np.argsort(d2c)[:n_probe]]
        tabs = {
            c: (((q - coarse[c]).reshape(m, 1, d_sub) - cb) ** 2).sum(-1) for c in probe
        }
        cands = []
        for nid, cell in cell_of.items():
            if nid == qid or cell not in tabs:
                continue
            d = sum(tabs[cell][j, codes[nid][j]] for j in range(m))
            cands.append((np.floor(d / dim * 1e6 + 0.5) / 1e6, nid))
        cands.sort(key=lambda t: (t[0], t[1]))
        short = [nid for _, nid in cands[: k * refine]]
        rer = sorted(
            (np.floor(((vecs[nid] - q) ** 2).sum() / dim * 1e6 + 0.5) / 1e6, nid)
            for nid in short
        )
        for rank, (d, nid) in enumerate(rer[:k], 1):
            want[(qid, rank)] = nid
    assert got == want


def test_mips_differs_from_cosine_when_norms_carry_signal(spark):
    """The reason MIPS exists: a long vector with a worse angle must beat a
    short well-aligned one on inner product while losing on cosine."""
    import pyspark.sql.functions as F

    rows = [
        (0, [1.0] + [0.0] * 63, "q"),
        (1, [0.95] + [0.05] * 63, "short_aligned"),   # |x| ~ 1, cos ~ high
        (2, [5.0] + [2.0] * 63, "long_tilted"),       # big norm, worse angle
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )
    t = {"embeddings": emb}
    mips_best = (
        similarity.mips_topk(t, num_queries=1, k=1).collect()[0].neighbor_id
    )
    cos_best = (
        similarity.cosine_topk(t, num_queries=1, k=1).collect()[0].neighbor_id
    )
    assert mips_best == 2
    assert cos_best == 1


def test_mips_ann_recall_and_audit(tables_med):
    """The augmented-LSH MIPS path must clear its pinned recall floor, and
    the audit row must report it green."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.mips_topk(tables_med).collect()
    }
    ann = {
        (r.query_id, r.neighbor_id)
        for r in similarity.mips_ann_topk(tables_med).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= similarity.MIPS_RECALL_FLOOR, recall
    (row,) = similarity.mips_recall_audit(tables_med).collect()
    assert row.recall_ok and row.n_queries == 20


def test_mips_ann_zero_norm_query_not_dropped(spark):
    """ADVICE r3: a zero-norm query vector must not vanish from the ANN
    output (null buckets would silently drop it and skew the recall audit
    denominator); the guarded transform maps it to a deterministic bucket
    and exact-dot reranking still applies."""
    rows = [(0, [0.0] * 64), (1, [1.0] + [0.5] * 63), (2, [0.2] * 64),
            (3, [-1.0] + [0.3] * 63)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = similarity.mips_ann_topk(
        {"embeddings": emb}, num_queries=2, k=2
    ).collect()
    qids = {r.query_id for r in out}
    assert 0 in qids  # the zero-norm query survives
    assert all(r.dot == r.dot for r in out)  # no NaNs


def test_mips_ann_empty_corpus_returns_empty(spark):
    """ADVICE r3: max-norm aggregate over an empty table is None -> must
    default, not TypeError."""
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert similarity.mips_ann_topk({"embeddings": emb}).count() == 0


def test_binary_hamming_recall_vs_exact(tables):
    """The 64-bit sign sketch with a 32-deep exact rerank must recover most
    of the exact cosine top-5 — and is fully deterministic."""
    exact = {}
    for r in similarity.cosine_topk(tables).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in similarity.binary_hamming_topk(tables).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    recall = hits / sum(len(v) for v in exact.values())
    assert recall >= 0.5, recall  # measured 0.63-0.75 across fixture SFs


def test_matryoshka_recall_bounds(tables):
    rows = similarity.matryoshka_audit(tables).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.k_full == 5
        assert 0 <= r.n_overlap <= 5
        assert abs(r.recall_at_k - r.n_overlap / 5) < 1e-9


def test_outlier_zscore_flags_planted_outlier(spark):
    """A vector planted far from its cluster's centroid must be the one
    flagged row in that cluster."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for vid in range(40):
        v = (rng.normal(0, 0.05, 64) + 1.0).astype("float32")
        rows.append((vid, [float(x) for x in v], 0))
    rows.append((40, [float(50.0)] * 64, 0))  # the planted outlier
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    out = similarity.outlier_zscore({"embeddings": emb}).collect()
    flagged = [r.vec_id for r in out if r.is_outlier]
    assert flagged == [40]


def test_pca_audit_oracle_and_lowrank(spark, tables):
    """Audit booleans hold on the fixture; on a crafted rank-2 corpus the
    k=2 reconstruction must be (near) exact — mse == spectral tail == ~0."""
    import numpy as np

    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        similarity.pca_audit(tables), similarity.ORACLES["sim_pca_audit"], SF_DIR
    )
    rng = np.random.default_rng(3)
    basis = rng.normal(size=(2, 64))
    rows = []
    for vid in range(60):
        coef = rng.normal(size=2)
        v = coef @ basis
        rows.append((vid, [float(x) for x in v], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    (row,) = similarity.pca_audit({"embeddings": emb}, k=2).collect()
    assert row.orthonormal and row.spectrum_sorted and row.recon_matches_tail
    assert row.n_vectors == 60
    # rank-2 data, k=2 projection: total variance captured, tail ~ 0
    assert row.total_var > 0


def test_contrastive_pairs_semantics(tables):
    """Hard negatives must be cross-label by construction and ranked by
    cosine; positives counted within-label."""
    from .conftest import SF_DIR
    from .oracle import assert_matches_oracle

    df = similarity.contrastive_pairs(tables)
    assert_matches_oracle(df, similarity.ORACLES["sim_contrastive_pairs"], SF_DIR)
    rows = df.collect()
    assert all(r.negative_label != r.anchor_label for r in rows)
    by_anchor = {}
    for r in rows:
        by_anchor.setdefault(r.anchor_id, []).append(r)
    for a, rs in by_anchor.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3]
        assert all(x.neg_cosine >= y.neg_cosine for x, y in zip(rs, rs[1:]))
        assert rs[0].n_pos > 0
