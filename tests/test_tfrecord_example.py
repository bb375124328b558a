"""tf.train.Example wire-format codec tests (sources/tfrecord.py).

The golden bytes below are HAND-FRAMED from the public protobuf wire
spec (tag = field<<3 | wiretype; length-delimited = 2), independently
of the encoder under test — so encode/decode are checked against the
format itself, not against each other.
"""

from __future__ import annotations

import struct

import pytest

from data_juicer_spark.sources.tfrecord import (
    decode_example, encode_example, read_tfrecord_examples,
    write_tfrecord_examples,
)


def _entry(key: bytes, feature: bytes) -> bytes:
    inner = bytes([0x0A, len(key)]) + key + bytes([0x12, len(feature)]) \
        + feature
    return bytes([0x0A, len(inner)]) + inner


def _example(entries: bytes) -> bytes:
    return bytes([0x0A, len(entries)]) + entries


def test_hand_framed_bytes_list_golden():
    # BytesList{value=["hi"]}: field1 wt2 -> 0A 02 'h' 'i'
    bytes_list = bytes([0x0A, 0x02]) + b"hi"
    # Feature{bytes_list=...}: field1 wt2
    feature = bytes([0x0A, len(bytes_list)]) + bytes_list
    golden = _example(_entry(b"text", feature))
    assert decode_example(golden) == {"text": [b"hi"]}
    assert encode_example({"text": [b"hi"]}) == golden


def test_hand_framed_packed_int64_and_float():
    # Int64List{value=[1, 300]} packed: varints 01, AC 02
    packed_ints = bytes([0x01, 0xAC, 0x02])
    int64_list = bytes([0x0A, len(packed_ints)]) + packed_ints
    f_ints = bytes([0x1A, len(int64_list)]) + int64_list  # Feature field 3
    # FloatList{value=[0.5, -1.25]} packed little-endian float32
    packed_floats = struct.pack("<2f", 0.5, -1.25)
    float_list = bytes([0x0A, len(packed_floats)]) + packed_floats
    f_floats = bytes([0x12, len(float_list)]) + float_list  # field 2
    golden = _example(_entry(b"ids", f_ints) + _entry(b"vec", f_floats))
    assert decode_example(golden) == {
        "ids": [1, 300], "vec": [0.5, -1.25]}
    assert encode_example({"ids": [1, 300], "vec": [0.5, -1.25]}) == golden


def test_unpacked_repeated_fields_decode():
    # proto2-style writers emit repeated scalars UNPACKED: one tagged
    # varint / fixed32 per element (tag 0x08 = field1 wt0, 0x0D = wt5)
    int64_list = bytes([0x08, 0x05, 0x08, 0x2A])  # values 5, 42
    f_ints = bytes([0x1A, len(int64_list)]) + int64_list
    float_list = bytes([0x0D]) + struct.pack("<f", 2.0) \
        + bytes([0x0D]) + struct.pack("<f", 3.5)
    f_floats = bytes([0x12, len(float_list)]) + float_list
    golden = _example(_entry(b"i", f_ints) + _entry(b"f", f_floats))
    assert decode_example(golden) == {"i": [5, 42], "f": [2.0, 3.5]}


def test_negative_int64_roundtrip():
    rec = encode_example({"ids": [-1, -(1 << 62), (1 << 62)]})
    assert decode_example(rec) == {"ids": [-1, -(1 << 62), (1 << 62)]}


def test_str_and_empty_and_unknown_field_tolerance():
    rec = encode_example({"s": ["héllo", b"\x00\xff"], "empty": []})
    assert decode_example(rec) == {
        "s": ["héllo".encode(), b"\x00\xff"], "empty": []}
    # unknown trailing field in Example (field 9, varint) is skipped
    assert decode_example(rec + bytes([0x48, 0x07])) == decode_example(rec)


def test_truncated_record_raises():
    rec = encode_example({"x": [1]})
    with pytest.raises(ValueError):
        decode_example(rec[:-2])


def test_spark_examples_roundtrip(spark, tmp_path):
    rows = [(i, f"doc-{i}".encode(), [float(i), i / 2.0], [i, i * 7])
            for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, vec array<double>, "
              "ids array<long>")
    out = str(tmp_path / "ex_shards")
    n = write_tfrecord_examples(
        df.selectExpr("array(payload) AS payload",
                      "cast(vec as array<float>) AS vec", "ids"),
        out, feature_cols=["payload", "vec", "ids"], num_shards=3)
    assert n == 40

    back = read_tfrecord_examples(
        spark, f"{out}/*.tfrecord",
        {"payload": "bytes", "vec": "float", "ids": "int64"},
        verify_crc=True)
    got = {bytes(r["payload"][0]): (r["vec"], r["ids"])
           for r in back.collect()}
    assert len(got) == 40
    for i in range(40):
        vec, ids = got[f"doc-{i}".encode()]
        assert ids == [i, i * 7]
        assert vec == pytest.approx([float(i), i / 2.0])


def test_truncated_mid_varint_raises_valueerror():
    # truncation landing INSIDE a varint must still be ValueError, not
    # IndexError (0x84 has the continuation bit set, buffer ends)
    with pytest.raises(ValueError):
        decode_example(b"\x0a\x84")


def test_numpy_float32_encodes_as_float_list():
    np = pytest.importorskip("numpy")
    rec = encode_example({"v": [np.float32(2.75), np.float32(-0.5)]})
    assert decode_example(rec) == {"v": [2.75, -0.5]}
    # and int dtypes still land in Int64List
    rec = encode_example({"i": [np.int64(7), np.int32(-3)]})
    assert decode_example(rec) == {"i": [7, -3]}


def test_example_roundtrip_property():
    """Property: any {name: homogeneous list of bytes/str/int/float}
    survives encode→decode (floats through float32 precision)."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st
    import struct as _struct

    feature_vals = st.one_of(
        st.lists(st.binary(max_size=40), max_size=6),
        st.lists(st.text(max_size=20), max_size=6),
        st.lists(st.integers(min_value=-(1 << 63),
                             max_value=(1 << 63) - 1), max_size=6),
        st.lists(st.floats(allow_nan=False, allow_infinity=False,
                           width=32), max_size=6),
    )
    features = st.dictionaries(
        st.text(min_size=1, max_size=12), feature_vals, max_size=5)

    @settings(max_examples=300, deadline=None)
    @given(features)
    def check(feats):
        got = decode_example(encode_example(feats))
        assert set(got) == set(feats)
        for k, vals in feats.items():
            want = []
            is_float = any(isinstance(v, float) for v in vals)
            for v in vals:
                if is_float:
                    want.append(_struct.unpack(
                        "<f", _struct.pack("<f", float(v)))[0])
                elif isinstance(v, str):
                    want.append(v.encode("utf-8"))
                elif isinstance(v, (bytes, bytearray)):
                    want.append(bytes(v))
                else:
                    want.append(v)
            assert got[k] == want, (k, vals, got[k])

    check()


def test_split_bytes_list_occurrences_merge():
    """Protobuf merge semantics: a BytesList split across two field-1
    occurrences of the SAME Feature concatenates its values (message
    fields merge); previously only the first occurrence was decoded."""
    bl1 = bytes([0x0A, 0x02]) + b"hi"
    bl2 = bytes([0x0A, 0x03]) + b"bye"
    feature = (bytes([0x0A, len(bl1)]) + bl1
               + bytes([0x0A, len(bl2)]) + bl2)
    golden = _example(_entry(b"text", feature))
    assert decode_example(golden) == {"text": [b"hi", b"bye"]}


def test_split_int64_list_occurrences_merge():
    packed = bytes([0x01, 0xAC, 0x02])  # [1, 300]
    il1 = bytes([0x0A, len(packed)]) + packed
    il2 = bytes([0x0A, 0x01, 0x07])  # [7]
    feature = (bytes([0x1A, len(il1)]) + il1
               + bytes([0x1A, len(il2)]) + il2)
    golden = _example(_entry(b"ids", feature))
    assert decode_example(golden) == {"ids": [1, 300, 7]}


def test_oneof_kind_switch_clears_earlier_kind():
    """Last-kind-wins: a Feature carrying BytesList THEN Int64List
    decodes as the int list only (oneof switch clears prior state)."""
    bl = bytes([0x0A, 0x02]) + b"hi"
    il = bytes([0x0A, 0x01, 0x2A])  # [42]
    feature = (bytes([0x0A, len(bl)]) + bl
               + bytes([0x1A, len(il)]) + il)
    golden = _example(_entry(b"x", feature))
    assert decode_example(golden) == {"x": [42]}


def test_split_feature_submessage_occurrences_merge():
    """Two field-2 (Feature) occurrences inside one map entry merge by
    wire-byte concatenation before decoding."""
    bl1 = bytes([0x0A, 0x02]) + b"hi"
    bl2 = bytes([0x0A, 0x03]) + b"bye"
    f1 = bytes([0x0A, len(bl1)]) + bl1
    f2 = bytes([0x0A, len(bl2)]) + bl2
    key = b"text"
    inner = (bytes([0x0A, len(key)]) + key
             + bytes([0x12, len(f1)]) + f1
             + bytes([0x12, len(f2)]) + f2)
    entry = bytes([0x0A, len(inner)]) + inner
    golden = _example(entry)
    assert decode_example(golden) == {"text": [b"hi", b"bye"]}


def test_duplicate_map_keys_last_wins():
    bl1 = bytes([0x0A, 0x02]) + b"v1"
    bl2 = bytes([0x0A, 0x02]) + b"v2"
    feat1 = bytes([0x0A, len(bl1)]) + bl1
    feat2 = bytes([0x0A, len(bl2)]) + bl2
    golden = _example(_entry(b"k", feat1) + _entry(b"k", feat2))
    assert decode_example(golden) == {"k": [b"v2"]}
