"""Multimodal plumbing (stubbed codecs, real Spark paths) + similarity
search + streaming replay."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS


@pytest.fixture()
def images(spark):
    rows = [
        (0, b"imagebytes-aaaa"),
        (1, b"imagebytes-bbbb"),
        (2, b"imagebytes-aaaa"),   # exact dup of 0 -> same fake decode -> same phash
        (3, None),
    ]
    return spark.createDataFrame(rows, ["img_id", "image"])


def test_image_metadata_mapper(spark, images):
    op = OPERATORS.get("image_metadata_mapper")(fake_decode=True)
    out = {r["img_id"]: r["image_meta"] for r in op.apply(images).collect()}
    assert out[0]["width"] > 0 and out[0]["decode_error"] is None
    assert out[0]["n_channels"] == 3
    # deterministic: same bytes -> same fake shape
    assert out[0]["width"] == out[2]["width"]


def test_image_metadata_real_decode_faults_isolated(spark, images):
    # fake_decode=False must not kill the job: error captured per row
    op = OPERATORS.get("image_metadata_mapper")(fake_decode=False)
    out = {r["img_id"]: r["image_meta"] for r in op.apply(images).collect()}
    assert all(m["decode_error"] is not None for m in out.values())


def test_image_shape_filter(spark, images):
    meta = OPERATORS.get("image_metadata_mapper")(fake_decode=True).apply(images)
    kept = OPERATORS.get("image_shape_filter")(min_width=1).apply(meta)
    ids = sorted(r["img_id"] for r in kept.collect())
    assert ids == [0, 1, 2, 3]  # all fake-decodable (None decodes via empty hash)


def test_image_phash_dedup(spark, images):
    op = OPERATORS.get("image_phash_deduplicator")(id_key="img_id", fake_decode=True)
    ids = sorted(r["img_id"] for r in op.apply(images).collect())
    assert 2 not in ids      # dup of 0 removed
    assert 0 in ids and 1 in ids


def test_video_frame_sample(spark):
    df = spark.createDataFrame([(0, b"0123456789abcdef")], ["vid", "video"])
    op = OPERATORS.get("video_frame_sample_mapper")(n_frames=4)
    out = op.apply(df).orderBy("frame_id").collect()
    assert [r["frame_id"] for r in out] == [0, 1, 2, 3]
    assert out[0]["frame"] == b"0123"


def test_audio_duration_filter(spark):
    df = spark.createDataFrame(
        [(0, b"\0" * 32000), (1, b"\0" * 320000)], ["aid", "audio"]
    )
    op = OPERATORS.get("audio_duration_filter")(min_seconds=5.0)
    assert [r["aid"] for r in op.apply(df).collect()] == [1]


def test_similarity_bruteforce_and_lsh(spark):
    import numpy as np
    from data_juicer_spark.functions.similarity import brute_force_topk, lsh_topk

    rng = np.random.RandomState(7)
    vecs = rng.normal(size=(50, 16)).astype(float)
    vecs[10] = vecs[0] * 2.0  # same direction as 0 -> cosine 1.0
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.where("vec_id = 0").selectExpr("vec_id as q_id", "embedding")
    c = df.where("vec_id > 0")
    top = brute_force_topk(q, c, k=3).orderBy("rank").collect()
    assert top[0]["vec_id"] == 10 and top[0]["cos_sim"] == pytest.approx(1.0)
    # LSH: same-direction vector shares every hyperplane sign -> found
    ann = lsh_topk(q, c, dim=16, k=3, n_planes=8).collect()
    assert any(r["vec_id"] == 10 for r in ann)


def test_streaming_replay_file_source(spark):
    """End-to-end Structured Streaming: event files tailed -> foreachBatch
    epoch transactions -> final state equals batch replay."""
    from data_juicer_spark.cdc import generate_events, CdcReplayer
    from data_juicer_spark.lake import SnapshotTable
    from data_juicer_spark.streaming import StreamingReplayer

    d = tempfile.mkdtemp(prefix="stream_")
    try:
        events = generate_events(spark, 1000, batch_size=250, n_repos=5,
                                 n_paths=40, num_partitions=2)
        # write binlog segments: one file per epoch (ordered tail)
        for ep in range(4):
            events.where(F.col("epoch") == ep).coalesce(1).write.mode(
                "append").parquet(f"{d}/log")
        # batch replay reference
        t_batch = SnapshotTable(spark, f"{d}/batch", ["repo", "path"], num_buckets=4)
        CdcReplayer(t_batch).replay(events)
        # streaming replay (availableNow drains the directory then stops)
        t_stream = SnapshotTable(spark, f"{d}/stream", ["repo", "path"], num_buckets=4)
        sr = StreamingReplayer(CdcReplayer(t_stream), checkpoint_dir=f"{d}/ckpt")
        q = sr.start(sr.file_stream(spark, f"{d}/log", max_files_per_trigger=2),
                     available_now=True)
        q.awaitTermination(120)

        def state(t):
            return {
                (r["repo"], r["path"]): r["h"]
                for r in t.read().select(
                    "repo", "path", F.sha2("content", 256).alias("h")).collect()
            }

        assert state(t_batch) == state(t_stream)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_ivf_topk_recall(spark):
    """IVF path: on well-clustered data the probed lists contain the true
    neighbors, so IVF top-k matches brute force for in-cluster queries."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_juicer_spark.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.RandomState(7)
    centers = rng.normal(scale=10.0, size=(4, 16))
    rows = []
    vid = 0
    for ci in range(4):
        for _ in range(50):
            v = centers[ci] + rng.normal(scale=0.5, size=16)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id").isin([0, 60, 120, 180])) \
        .selectExpr("vec_id as q_id", "embedding")
    corpus = df
    exact = {(r["q_id"], r["rank"]): r["vec_id"]
             for r in brute_force_topk(queries, corpus, k=5).collect()}
    approx = {(r["q_id"], r["rank"]): r["vec_id"]
              for r in ivf_topk(queries, corpus, k=5, n_lists=4,
                                n_probe=2, seed=42).collect()}
    assert approx == exact  # clusters are well separated → full recall
