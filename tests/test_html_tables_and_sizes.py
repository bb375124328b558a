"""Reference-golden parity for extract_tables_from_html_mapper
(tests/ops/mapper/test_extract_tables_from_html_mapper.py:13-117) and
unit coverage for the media size / aspect-ratio filters
(filter/audio_size_filter.py, image_size_filter.py,
image_aspect_ratio_filter.py)."""

from __future__ import annotations

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.functions.html_tables import extract_tables
from data_juicer_spark.registry import OPERATORS

RAW_HTML = """
    <!DOCTYPE html>
            <html lang="zh">
            <head>
                <meta charset="UTF-8">
                <title>表格示例</title>
            </head>
            <body>
                <h1>表格示例</h1>
                <table border="1">
                    <thead>
                        <tr>
                            <th>姓名</th>
                            <th>年龄</th>
                            <th>城市</th>
                        </tr>
                    </thead>
                    <tbody>
                        <tr>
                            <td>张三</td>
                            <td>25</td>
                            <td>北京</td>
                        </tr>
                        <tr>
                            <td>李四</td>
                            <td>30</td>
                            <td>上海</td>
                        </tr>
                        <tr>
                            <td>王五</td>
                            <td>28</td>
                            <td>广州</td>
                        </tr>
                    </tbody>
                </table>
            </body>
            </html>
    """

BODY_ROWS = [["张三", "25", "北京"], ["李四", "30", "上海"],
             ["王五", "28", "广州"]]
HEADER_ROW = ["姓名", "年龄", "城市"]


def _tables(spark, text, **kw):
    op = OPERATORS.get("extract_tables_from_html_mapper")(**kw)
    df = spark.createDataFrame([(text,)], "text string")
    return op.apply(df).first()["html_tables"]


def test_retain_html_tags(spark):
    got = _tables(spark, RAW_HTML, retain_html_tags=True)
    assert len(got) == 1
    assert got[0].startswith('<table border="1">')
    assert got[0].endswith("</table>")
    assert "张三" in got[0]


def test_extract_tables_include_header(spark):
    assert _tables(spark, RAW_HTML) == [[HEADER_ROW] + BODY_ROWS]


def test_extract_tables_without_header(spark):
    assert _tables(spark, RAW_HTML, include_header=False) == [BODY_ROWS]


def test_multiple_tables(spark):
    got = _tables(spark, RAW_HTML + RAW_HTML)
    assert got == [[HEADER_ROW] + BODY_ROWS] * 2


def test_large_html_content(spark):
    large = "<html>" + "".join(
        f"<table><tr><td>Row {i}</td></tr></table>" for i in range(1000)
    ) + "</html>"
    got = _tables(spark, large)
    assert len(got) == 1000
    assert got[0] == [["Row 0"]]
    assert got[999] == [["Row 999"]]


def test_no_tables(spark):
    got = _tables(spark, "<html><body>No tables here!</body></html>")
    assert got == []


def test_existing_column_untouched(spark):
    op = OPERATORS.get("extract_tables_from_html_mapper")()
    df = spark.createDataFrame([("<table><tr><td>x</td></tr></table>",
                                 ["keep"])],
                               "text string, html_tables array<string>")
    assert op.apply(df).first()["html_tables"] == ["keep"]


def test_nested_table_recursive_semantics():
    # bs4 find_all is recursive: inner table standalone AND its row
    # accumulated into the outer table; outer cell text includes inner
    nested = ("<table><tr><td>outer"
              "<table><tr><td>inner</td></tr></table>"
              "</td></tr></table>")
    assert extract_tables(nested) == [
        [["outerinner"], ["inner"]], [["inner"]]]


# ---- size filters ----------------------------------------------------

def test_audio_size_filter_binary_any(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"x" * 5000)),
         (3, None)],
        "id long, audio binary")
    op = OPERATORS.get("audio_size_filter")(min_size="1kb", max_size="1mb")
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [2, 3]  # no-audio sample kept, like the reference


def test_image_size_filter_array_all_vs_any(spark):
    df = spark.createDataFrame(
        [(1, [bytearray(b"x" * 10), bytearray(b"x" * 9000)]),
         (2, [bytearray(b"x" * 2000), bytearray(b"x" * 3000)]),
         (3, [])],
        "id long, image array<binary>")
    any_ids = sorted(r["id"] for r in OPERATORS.get("image_size_filter")(
        min_size="1kb", max_size="8kb").apply(df).collect())
    all_ids = sorted(r["id"] for r in OPERATORS.get("image_size_filter")(
        min_size="1kb", max_size="8kb", any_or_all="all").apply(df).collect())
    assert any_ids == [2, 3]
    assert all_ids == [2, 3]


def test_audio_size_filter_paths(spark, tmp_path):
    small = tmp_path / "a.bin"
    small.write_bytes(b"x" * 10)
    big = tmp_path / "b.bin"
    big.write_bytes(b"x" * 4000)
    df = spark.createDataFrame(
        [(1, str(small)), (2, str(big)), (3, str(tmp_path / "missing"))],
        "id long, audio string")
    op = OPERATORS.get("audio_size_filter")(min_size="1kb", max_size="1mb")
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [2]  # missing file stats to -1 → filtered


def test_size_filter_bad_strategy():
    with pytest.raises(ValueError, match="not supported"):
        OPERATORS.get("audio_size_filter")(any_or_all="some")


def test_image_aspect_ratio_filter(spark):
    rows = [(1, (100, 50, 3, "fake", None)),    # ratio 2.0 keep
            (2, (100, 20, 3, "fake", None)),    # ratio 5.0 drop
            (3, (None, None, None, None, "boom"))]
    df = spark.createDataFrame(
        rows, "id long, image_meta struct<width:int,height:int,"
              "n_channels:int,format:string,decode_error:string>")
    op = OPERATORS.get("image_aspect_ratio_filter")()
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [1]


def test_video_deduplicator(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"aa"), "t1"), (2, bytearray(b"aa"), "t2"),
         (3, bytearray(b"bb"), "t1")],
        "id long, video binary, text string")
    op = OPERATORS.get("video_deduplicator")(id_key="id")
    assert sorted(r["id"] for r in op.apply(df).collect()) == [1, 3]
    op2 = OPERATORS.get("video_deduplicator")(id_key="id",
                                              consider_text=True)
    assert sorted(r["id"] for r in op2.apply(df).collect()) == [1, 2, 3]


def test_video_deduplicator_array_concat(spark):
    # all payloads feed one digest, like the reference's packet loop
    df = spark.createDataFrame(
        [(1, [bytearray(b"a"), bytearray(b"b")]), (2, [bytearray(b"ab")]),
         (3, [bytearray(b"c")])],
        "id long, video array<binary>")
    op = OPERATORS.get("video_deduplicator")(id_key="id")
    assert sorted(r["id"] for r in op.apply(df).collect()) == [1, 3]


def test_audio_gaussian_noise(spark):
    import numpy as np
    pcm = (np.sin(np.linspace(0, 20, 4000)) * 8000).astype("<i2").tobytes()
    df = spark.createDataFrame([(1, bytearray(pcm)), (2, None)],
                               "id long, audio binary")
    op = OPERATORS.get("audio_add_gaussian_noise_mapper")(
        min_amplitude=0.01, max_amplitude=0.02, p=1.0)
    rows = {r["id"]: r["audio"] for r in op.apply(df).collect()}
    assert rows[2] is None                       # no audio → unchanged
    assert rows[1] is not None and bytes(rows[1]) != pcm
    noisy = np.frombuffer(bytes(rows[1]), dtype="<i2")
    orig = np.frombuffer(pcm, dtype="<i2")
    # noise amplitude bounded: rms error within a few hundred LSB
    rms = float(np.sqrt(np.mean((noisy.astype(float) - orig) ** 2)))
    assert 100 < rms < 2000
    # deterministic (payload-seeded RNG): second run identical
    again = {r["id"]: r["audio"] for r in op.apply(df).collect()}
    assert bytes(again[1]) == bytes(rows[1])
    # p=0 → identity
    op0 = OPERATORS.get("audio_add_gaussian_noise_mapper")(p=0.0)
    assert bytes(op0.apply(df).collect()[0]["audio"]) == pcm


def test_audio_gaussian_noise_validation():
    with pytest.raises(ValueError, match="min_amplitude must be <"):
        OPERATORS.get("audio_add_gaussian_noise_mapper")(
            min_amplitude=0.5, max_amplitude=0.1)


def test_image_blur_mapper(spark):
    import numpy as np
    df = spark.createDataFrame([(1, bytearray(b"img-payload-1"))],
                               "id long, image binary")
    op = OPERATORS.get("image_blur_mapper")(p=1.0, blur_type="gaussian",
                                            radius=2)
    out = bytes(op.apply(df).collect()[0]["image"])
    from data_juicer_spark.operators.multimodal import _decode_image
    arr = _decode_image(b"img-payload-1", True)
    assert len(out) == arr.size                  # raw RGB, same shape
    blurred = np.frombuffer(out, dtype=np.uint8).reshape(arr.shape)
    # blur reduces spatial variance of the random fake image
    assert blurred.astype(float).var() < arr.astype(float).var() * 0.8
    # deterministic
    assert bytes(op.apply(df).collect()[0]["image"]) == out
    # p=0 → identity
    op0 = OPERATORS.get("image_blur_mapper")(p=0.0)
    assert bytes(op0.apply(df).collect()[0]["image"]) == b"img-payload-1"


def test_image_blur_validation():
    with pytest.raises(ValueError, match="not supported"):
        OPERATORS.get("image_blur_mapper")(blur_type="motion")
    with pytest.raises(ValueError, match="Radius must be"):
        OPERATORS.get("image_blur_mapper")(radius=-1)


def test_ffmpeg_command_construction():
    from data_juicer_spark.operators.multimodal import build_ffmpeg_command
    cmd = build_ffmpeg_command(
        "/in/a.mp4", "/out/a.video_ffmpeg_wrapped_mapper.mp4", "-vf",
        "scale", {"width": 224, "height": 224}, ["-threads", "1"], True)
    assert cmd == ["ffmpeg", "-y", "-i", "/in/a.mp4", "-vf",
                   "scale=width=224:height=224", "-threads", "1",
                   "/out/a.video_ffmpeg_wrapped_mapper.mp4"]
    # no kwargs → bare filter name; no overwrite → no -y
    cmd2 = build_ffmpeg_command("i.wav", "o.wav", "-af", "loudnorm",
                                None, None, False)
    assert cmd2 == ["ffmpeg", "-i", "i.wav", "-af", "loudnorm", "o.wav"]


def test_ffmpeg_wrapped_identity_and_dlq(spark, tmp_path):
    df = spark.createDataFrame([(1, str(tmp_path / "v.mp4"))],
                               "id long, video string")
    # no filter_name → identity passthrough (reference contract)
    ident = OPERATORS.get("video_ffmpeg_wrapped_mapper")()
    assert ident.apply(df).columns == ["id", "video"]
    # with a filter but no ffmpeg binary → per-row DLQ failure, not a crash
    import shutil
    op = OPERATORS.get("audio_ffmpeg_wrapped_mapper")(
        filter_name="loudnorm", media_key="video")
    row = op.apply(df).first()
    if shutil.which("ffmpeg") is None:
        assert row["video_status"] == "failed"
        assert "ffmpeg binary not on" in row["video_error"]
    else:  # real ffmpeg present: bad input file still lands in DLQ
        assert row["video_status"] == "failed"


def test_image_resize_mapper(spark):
    import numpy as np

    from data_juicer_spark.operators.multimodal import _decode_image

    df = spark.createDataFrame([(1, bytearray(b"resize-me"))],
                               "id long, image binary")
    op = OPERATORS.get("image_resize_mapper")(width=8, height=6)
    out = bytes(op.apply(df).collect()[0]["image"])
    assert len(out) == 8 * 6 * 3                 # raw RGB at target shape
    # identity resize (same dims, nearest) reproduces the source pixels
    arr = _decode_image(b"resize-me", True)
    ident = OPERATORS.get("image_resize_mapper")(
        width=arr.shape[1], height=arr.shape[0], interpolation="nearest")
    assert bytes(ident.apply(df).collect()[0]["image"]) == arr.tobytes()
    # bilinear mean is preserved within rounding
    small = np.frombuffer(out, np.uint8).reshape(6, 8, 3)
    assert abs(float(small.mean()) - float(arr.mean())) < 16
    with pytest.raises(ValueError, match="not supported"):
        OPERATORS.get("image_resize_mapper")(width=4, height=4,
                                             interpolation="lanczos")
    with pytest.raises(ValueError, match=">= 1"):
        OPERATORS.get("image_resize_mapper")(width=0, height=4)


def test_video_dedup_consider_text_null_text(spark):
    # distinct videos with NULL text must not collapse into one group
    df = spark.createDataFrame(
        [(1, bytearray(b"aa"), None), (2, bytearray(b"bb"), None),
         (3, bytearray(b"aa"), None)],
        "id long, video binary, text string")
    op = OPERATORS.get("video_deduplicator")(id_key="id",
                                             consider_text=True)
    assert sorted(r["id"] for r in op.apply(df).collect()) == [1, 2]


def test_media_size_filter_reversed_range(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"x" * 100)), (2, bytearray(b"x" * 5000))],
        "id long, audio binary")
    op = OPERATORS.get("audio_size_filter")(
        min_size="1kb", max_size="1mb", reversed_range=True)
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [1]  # keep OUTSIDE the range


def test_size_to_bytes_large_units():
    from data_juicer_spark.operators.multimodal import size_to_bytes
    assert size_to_bytes("1EB") == 1 << 60
    assert size_to_bytes("1ZiB") == 1 << 70
    assert size_to_bytes("1YB") == 1 << 80
