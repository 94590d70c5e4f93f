import numpy as np
import pytest

from networkit_spark.functions.multimodal import (
    audio_window_plan,
    decode_image_stub,
    frame_sample,
    image_features,
    synth_media,
)
from networkit_spark.functions.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
    pairwise_cosine_near_dup,
)

EMB_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{EMB_DIR}/embeddings.parquet").limit(200).cache()


def test_bruteforce_topk_matches_numpy(spark, emb):
    queries = emb.filter("vec_id < 5")
    got = cosine_topk_bruteforce(emb, queries, k=5).collect()
    rows = emb.collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for q in range(5):
        qi = np.where(ids == q)[0][0]
        sims = Mn @ Mn[qi]
        order = [
            int(ids[i]) for i in np.lexsort((ids, -sims)) if ids[i] != q
        ][:5]
        mine = [nid for _, nid, _ in sorted(by_q[q])]
        assert mine == order


def test_lsh_ann_recall(spark, emb):
    queries = emb.filter("vec_id < 20")
    exact = cosine_topk_bruteforce(emb, queries, k=5)
    approx = lsh_ann_topk(emb, queries, k=5, n_planes=4, n_tables=16)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, f"recall {recall}"


def test_pairwise_near_dup_self_consistency(spark, emb):
    # duplicate a vector with a new id -> must be found at cosine ~1
    import pyspark.sql.functions as F

    dup = emb.filter("vec_id = 0").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    df = emb.union(dup)
    pairs = pairwise_cosine_near_dup(df, threshold=0.999)
    found = {(r["a"], r["b"]) for r in pairs.collect()}
    assert (0, 100000) in found


def test_image_features_plumbing(spark):
    media = synth_media(spark, 30)
    feats = image_features(media, fake_decode=True).collect()
    assert len(feats) == 10  # ids % 3 == 0
    for r in feats:
        assert 0 <= r["mean_r"] <= 255
        assert r["n_pixels"] > 0
    # deterministic: same input -> same features
    feats2 = image_features(synth_media(spark, 30), fake_decode=True).collect()
    assert sorted(map(tuple, feats)) == sorted(map(tuple, feats2))


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xx", 4, 4, fake=False)


def test_frame_sample_and_audio_plan(spark):
    media = synth_media(spark, 30)
    fs = frame_sample(media, every_n=2)
    assert fs.count() > 0
    row = fs.groupBy("doc_id").count().orderBy("doc_id").first()
    assert row["count"] >= 1
    ap = audio_window_plan(media)
    assert ap.count() > 0
