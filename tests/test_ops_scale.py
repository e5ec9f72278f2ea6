"""Scale-shape tests for the pipeline ops: hash-first dedup plans and
banded-LSH ANN recall / bucket-cap guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparc.ops import dedup, similarity


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"unique text {i}") for i in range(200)]
    rows += [(1000 + i, "duplicated payload") for i in range(5)]
    rows += [(2000 + i, "another dup") for i in range(3)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates_results(docs):
    got = {
        r["keeper_id"]: r["n_copies"]
        for r in dedup.exact_duplicates(docs).collect()
    }
    assert got == {1000: 5, 2000: 3}


def test_exact_duplicates_exchange_carries_hash_not_text(docs):
    plan = _plan(dedup.exact_duplicates(docs))
    assert "sha2(" in plan  # digest computed map-side
    assert "hashpartitioning(__h" in plan  # exchange keyed on the digest
    # the exchange input is the partial aggregate over (__h, ids) — the
    # text column must be projected away before any exchange
    exchange_pos = plan.index("Exchange hashpartitioning")
    assert "text#" not in plan[exchange_pos:].split("+- ")[1]


def test_dedup_exact_keeps_min_id_rows(docs):
    out = dedup.dedup_exact(docs)
    ids = {r["doc_id"] for r in out.collect()}
    assert 1000 in ids and not any(i in ids for i in range(1001, 1005))
    assert 2000 in ids and 2001 not in ids
    assert all(i in ids for i in range(200))
    plan = _plan(out)
    assert "LeftSemi" in plan


# ---------------------------------------------------------------------------
# banded ANN
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    """100 random unit vectors + 10 planted near-duplicate pairs."""
    rng = np.random.default_rng(7)
    dim = 16
    base = rng.standard_normal((100, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, base[i].tolist()) for i in range(100)]
    for j in range(10):
        noisy = base[j] + 0.02 * rng.standard_normal(dim)
        noisy /= np.linalg.norm(noisy)
        rows.append((200 + j, noisy.tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_banded_dups_recall(vectors):
    """Every planted near-dup pair (sim ~0.999) must be recalled by the
    banded LSH at >= 90%; brute force is the ground truth."""
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_cosine_dups(
            vectors, threshold=0.98, n_bands=4, planes_per_band=4
        ).collect()
    }
    planted = {(j, 200 + j) for j in range(10)}
    assert len(got & planted) >= 9
    # no false positives: every reported pair really is above threshold
    brute = similarity.cosine_topk(vectors, vectors, k=3, round_to=6)
    high = {
        (min(r["query_id"], r["corpus_id"]), max(r["query_id"], r["corpus_id"]))
        for r in brute.collect()
        if r["sim"] >= 0.98
    }
    assert got <= high


def test_lsh_topk_matches_exact_for_planted_pairs(vectors):
    queries = vectors.filter(F.col("vec_id") < 5)
    got = similarity.lsh_topk(vectors, queries, k=1).collect()
    top = {r["query_id"]: r["corpus_id"] for r in got}
    # the planted near-dup is the true nearest neighbor of each query
    for j in range(5):
        assert top.get(j) == 200 + j


def test_bucket_cap_drops_degenerate_buckets(spark):
    """A pile of identical vectors lands in one bucket per band; with a
    cap below the pile size, the quadratic self-join is refused."""
    rows = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.embedding_cosine_dups(
        df, threshold=0.5, n_bands=2, planes_per_band=3, bucket_cap=10
    )
    assert out.count() == 0  # all buckets over cap -> no candidates
    # with a generous cap the pairs come back
    out2 = similarity.embedding_cosine_dups(
        df, threshold=0.5, n_bands=2, planes_per_band=3, bucket_cap=10_000
    )
    assert out2.count() == 50 * 49 // 2


def test_ivf_topk_recall_and_determinism(vectors):
    """IVF with nprobe=nlist is exact; modest nprobe recalls the planted
    nearest neighbors; centroids are deterministic across calls."""
    queries = vectors.filter(F.col("vec_id") < 5)
    cents1 = similarity.train_ivf_centroids(vectors, nlist=8, iters=3)
    cents2 = similarity.train_ivf_centroids(vectors, nlist=8, iters=3)
    assert cents1 == cents2
    # exact degenerate case: probe every list == brute force
    exact = similarity.cosine_topk(vectors, queries, k=3)
    full = similarity.ivf_topk(
        vectors, queries, k=3, nlist=8, nprobe=8, centroids=cents1
    )
    assert full.exceptAll(exact).count() == 0
    assert exact.exceptAll(full).count() == 0
    # nprobe=3: the planted near-dup (sim ~0.999, same cluster by
    # construction) is still the top hit
    got = similarity.ivf_topk(
        vectors, queries, k=1, nlist=8, nprobe=3, centroids=cents1
    ).collect()
    top = {r["query_id"]: r["corpus_id"] for r in got}
    assert sum(top.get(j) == 200 + j for j in range(5)) >= 4


def test_candidates_deduped_across_bands(vectors):
    """A pair colliding in several bands is scored once."""
    out = similarity.embedding_cosine_dups(
        vectors, threshold=0.98, n_bands=4, planes_per_band=2
    )
    pairs = [(r["id_a"], r["id_b"]) for r in out.collect()]
    assert len(pairs) == len(set(pairs))


def test_minhash_bucket_cap_bounds_hot_buckets(spark):
    """Round-3 nit: a mass-duplicated document (common in crawl data)
    must not make a MinHash band bucket quadratic — with a cap below the
    pile size the pile contributes zero candidate pairs, while distinct
    near-dup pairs elsewhere are unaffected."""
    from sparc.ops import dedup

    pile = [(i, "the same spam page body repeated verbatim") for i in range(60)]
    near = [
        (100, "a genuinely unique document about owls and rivers"),
        (101, "a genuinely unique document about owls and rivers!"),
    ]
    df = spark.createDataFrame(pile + near, "doc_id long, text string")
    capped = dedup.minhash_lsh_candidates(df, bucket_cap=20)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got          # the real near-dup pair survives
    assert all(a >= 100 for a, _ in got)  # the pile contributed nothing
    uncapped = dedup.minhash_lsh_candidates(df, bucket_cap=10_000)
    assert uncapped.count() >= 60 * 59 // 2  # cap was the only difference
