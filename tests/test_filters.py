"""Operator-level golden tests — same pattern as the reference's unit
tests (tests/ops/filter/test_text_length_filter.py:26-48: explicit rows
in, explicit surviving rows out)."""

import pytest
from pyspark.sql import functions as F

from data_juicer_spark.registry import OPERATORS
import data_juicer_spark.operators  # noqa: F401


def make_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]
    )


def kept_ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_text_length_filter(spark):
    # mirrors reference keep/drop semantics: keep 10 <= len <= 50
    texts = [
        "short",                               # 5  -> drop
        "a" * 10,                              # 10 -> keep (closed interval)
        "this is a medium length sentence.",   # 33 -> keep
        "x" * 50,                              # 50 -> keep
        "y" * 51,                              # 51 -> drop
    ]
    op = OPERATORS.get("text_length_filter")(min_len=10, max_len=50)
    out = op.apply(make_df(spark, texts))
    assert kept_ids(out) == [1, 2, 3]
    stats = {r["id"]: r["stats"]["text_len"] for r in out.collect()}
    assert stats == {1: 10, 2: 33, 3: 50}


def test_words_num_filter(spark):
    texts = ["one two three", "a b c d e f", "single", "sp\nlit\tby all"]
    op = OPERATORS.get("words_num_filter")(min_num=3, max_num=5)
    out = op.apply(make_df(spark, texts))
    # "sp\nlit\tby all" splits on space/newline/tab -> 4 words
    assert kept_ids(out) == [0, 3]


def test_alphanumeric_filter(spark):
    texts = ["abc123", "!!!???", "half! half"]
    op = OPERATORS.get("alphanumeric_filter")(min_ratio=0.5, max_ratio=1.0)
    out = op.apply(make_df(spark, texts))
    assert kept_ids(out) == [0, 2]
    ratios = {r["id"]: r["stats"]["alnum_ratio"] for r in out.collect()}
    assert ratios[0] == 1.0
    assert abs(ratios[2] - 8 / 10) < 1e-9


def test_line_length_filters(spark):
    texts = ["aaaa\nbb", "cccccc\ncccccc\ncccccc"]
    avg_op = OPERATORS.get("average_line_length_filter")(min_len=0, max_len=4)
    out = avg_op.apply(make_df(spark, texts))
    # len("aaaa\nbb")=7 / 2 lines = 3.5 <= 4 keep; 20/3=6.67 drop
    assert kept_ids(out) == [0]
    max_op = OPERATORS.get("maximum_line_length_filter")(min_len=5, max_len=100)
    out2 = max_op.apply(make_df(spark, texts))
    assert kept_ids(out2) == [1]


def test_trailing_newline_matches_python_splitlines(spark):
    # "a\nb\n".splitlines() == ["a","b"]: avg = 4/2 = 2.0
    op = OPERATORS.get("average_line_length_filter")(min_len=0, max_len=1000)
    out = op.apply(make_df(spark, ["a\nb\n"]))
    assert out.collect()[0]["stats"]["avg_line_length"] == pytest.approx(4 / 2)


def test_special_characters_filter(spark):
    texts = ["plainwords", "!!!###$$$", "half$ text"]
    op = OPERATORS.get("special_characters_filter")(min_ratio=0.0, max_ratio=0.3)
    out = op.apply(make_df(spark, texts))
    assert kept_ids(out) == [0, 2]


def test_character_repetition_filter(spark):
    # reference math: ratio of top-sqrt(distinct) 10-gram mass
    # cyclic string: 10 distinct 10-grams, each ~30x -> top-sqrt(10)=3 grams
    # hold 3/10 of the mass -> ratio ~0.30 (the reference formula caps the
    # numerator at sqrt(#distinct) grams)
    rep = "abcdefghij" * 30
    uniq = "the quick brown fox jumps over the lazy dog once"
    op = OPERATORS.get("character_repetition_filter")(rep_len=10, min_ratio=0.0, max_ratio=0.2)
    df = op.compute_stats(make_df(spark, [rep, uniq]))
    ratios = {r["id"]: r["stats"]["char_rep_ratio"] for r in df.collect()}
    assert 0.25 < ratios[0] < 0.35
    assert ratios[1] == 0.0
    assert kept_ids(op.apply(make_df(spark, [rep, uniq]))) == [1]


def test_word_repetition_filter(spark):
    rep = ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6).strip()
    # NB: words_refinement strips trailing digits (special chars), so use
    # purely alphabetic unique words
    uniq = " ".join(chr(97 + i // 26) + chr(97 + i % 26) + "x" for i in range(40))
    op = OPERATORS.get("word_repetition_filter")(rep_len=10, min_ratio=0.0, max_ratio=0.5)
    out = op.apply(make_df(spark, [rep, uniq]))
    assert kept_ids(out) == [1]


def test_stopwords_filter(spark):
    op = OPERATORS.get("stopwords_filter")(min_ratio=0.3)
    texts = ["the cat is on the mat", "lorem ipsum dolor sit amet"]
    out = op.apply(make_df(spark, texts))
    assert kept_ids(out) == [0]


def test_language_id_score_filter(spark):
    texts = [
        "the cat is in the house and it is warm",
        "el gato que vive en la casa es de los vecinos",
        "qqq zzz xxx",
    ]
    op = OPERATORS.get("language_id_score_filter")(lang="en", min_score=0.3)
    out = op.apply(make_df(spark, texts))
    assert kept_ids(out) == [0]
    op_es = OPERATORS.get("language_id_score_filter")(lang="es", min_score=0.3)
    assert kept_ids(op_es.apply(make_df(spark, texts))) == [1]


def test_perplexity_filter(spark):
    texts = ["the weather here is rather nice in the summer", "zqxjkv wqzxv qqqq"]
    op = OPERATORS.get("perplexity_filter")(max_ppl=100)
    out = op.apply(make_df(spark, texts))
    assert kept_ids(out) == [0]


def test_suffix_and_field_filters(spark):
    df = spark.createDataFrame(
        [(0, "a.py", "x", 5), (1, "b.md", "y", 15), (2, "c.py", "x", 25)],
        ["id", "suffix", "cat", "num"],
    )
    assert kept_ids(
        OPERATORS.get("suffix_filter")(suffixes=["a.py", "c.py"]).apply(df)
    ) == [0, 2]
    assert kept_ids(
        OPERATORS.get("specified_field_filter")(field_key="cat", target_value=["x"]).apply(df)
    ) == [0, 2]
    assert kept_ids(
        OPERATORS.get("specified_numeric_field_filter")(
            field_key="num", min_value=10, max_value=20
        ).apply(df)
    ) == [1]
    assert kept_ids(
        OPERATORS.get("general_field_filter")(filter_condition="num > 10 and cat = 'x'").apply(df)
    ) == [2]


def test_stats_struct_accumulates(spark):
    df = make_df(spark, ["hello world this is text", "tiny"])
    f1 = OPERATORS.get("text_length_filter")(min_len=1, max_len=1000)
    f2 = OPERATORS.get("words_num_filter")(min_num=1, max_num=1000)
    out = f2.apply(f1.apply(df))
    row = out.where(F.col("id") == 0).collect()[0]
    assert row["stats"]["text_len"] == 24
    assert row["stats"]["num_words"] == 5


def test_text_pair_similarity_filter(spark):
    rows = [(0, [1.0, 0.0], [1.0, 0.0]),    # identical -> 1.0
            (1, [1.0, 0.0], [0.0, 1.0]),    # orthogonal -> 0.0
            (2, [1.0, 0.0], [-1.0, 0.0]),   # opposite -> -1.0 (dropped)
            (3, [1.0, 1.0], [1.0, 0.9])]    # close -> ~0.997
    df = spark.createDataFrame(
        rows, "id long, embedding array<double>, embedding2 array<double>")
    from data_juicer_spark.registry import OPERATORS

    op = OPERATORS.get("text_pair_similarity_filter")(min_score=0.5)
    kept = sorted(r["id"] for r in op.apply(df).collect())
    assert kept == [0, 3]


def test_stopwords_words_refinement_and_aug_parity(spark):
    """refined_words must match a sequential port of the reference's
    words_refinement + words_augmentation (common/helper_func.py:103-170)
    including strip-of-special-chars and the CJK n-gram augmentation."""
    from data_juicer_spark.functions.text import (
        SPECIAL_CHARACTERS, refined_words,
    )

    texts = [
        "The quick, brown fox -- jumps over the LAZY dog!!",
        "欢迎 来到 阿里 巴巴 社区",
        "xin chào các bạn nhé",
        "...  ,,, !!!",  # every word strips to empty
        "",
        "a b",  # shorter than group size 3
    ]

    def ref_refine(text, group_sizes=(2, 3), join_char="*"):
        ws = [w for w in text.replace("\n", " ").replace("\t", " ").split(" ")
              if w != ""]
        ws = [w.lower() for w in ws]
        out = []
        for w in ws:
            i, j = 0, len(w)
            while i < j and w[i] in SPECIAL_CHARACTERS:
                i += 1
            while j > i and w[j - 1] in SPECIAL_CHARACTERS:
                j -= 1
            if w[i:j]:
                out.append(w[i:j])
        aug = []
        for g in group_sizes:
            aug.extend(join_char.join(out[i:i + g])
                       for i in range(len(out) - g + 1))
        return out + aug

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    got = {r["id"]: list(r["rw"]) for r in df.select(
        "id", refined_words(
            F.col("text"), use_words_aug=True,
            words_aug_group_sizes=(2, 3), words_aug_join_char="*"
        ).alias("rw")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref_refine(t), (i, t)


def test_stopwords_filter_words_aug_changes_ratio(spark):
    """use_words_aug grows the denominator with n-gram groups — the
    reference's CJK/Vietnamese handling (stopwords_filter.py:40-62)."""
    df = spark.createDataFrame([(0, "the cat the dog")], "id long, text string")
    base = OPERATORS.get("stopwords_filter")(min_ratio=0.0)
    aug = OPERATORS.get("stopwords_filter")(min_ratio=0.0,
                                            use_words_aug=True)
    r0 = base.apply(df).select("stats.stopwords_ratio").first()[0]
    r1 = aug.apply(df).select("stats.stopwords_ratio").first()[0]
    assert r0 == 0.5          # the, the of 4
    assert r1 == 2.0 / 7.0    # 4 words + 3 bigrams, members unchanged


def test_reference_call_site_compatibility(spark):
    """A reference user's constructor calls must work unchanged
    (round-4 param-surface audit): bool tokenization on words_num,
    hf_tokenizer on token_num, falsy lang on language_id, and loud —
    not silent — failures for the model-dep tokenization modes."""
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog today ok")],
        "id long, text string")

    # words_num: reference bool tokenization — False maps onto the
    # whitespace mode; True is LOUD (CJK sentencepiece counts diverge
    # from any proxy), the proxy stays opt-in via the explicit
    # engine mode 'regex_bpe'
    space = OPERATORS.get("words_num_filter")(min_num=1, tokenization=False)
    bpe = OPERATORS.get("words_num_filter")(min_num=1,
                                            tokenization="regex_bpe")
    assert space.apply(df).count() == 1
    assert bpe.apply(df).count() == 1
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        OPERATORS.get("words_num_filter")(min_num=1, tokenization=True)

    # token_num: reference hf_tokenizer kwarg constructs (advisory)
    tk = OPERATORS.get("token_num_filter")(
        hf_tokenizer="EleutherAI/pythia-6.9b-deduped", min_num=1)
    assert tk.apply(df).count() == 1

    # language_id: reference default lang="" keeps any language
    lid = OPERATORS.get("language_id_score_filter")(lang="", min_score=0.0)
    assert lid.apply(df).count() == 1

    # model-dep tokenization modes fail loudly at construction
    import pytest as _pytest
    for name, kwargs in [
        ("alphanumeric_filter", {"tokenization": True}),
        ("word_repetition_filter", {"tokenization": True}),
        ("stopwords_filter", {"tokenization": True}),
        ("flagged_words_filter", {"tokenization": True}),
    ]:
        with _pytest.raises(NotImplementedError):
            OPERATORS.get(name)(**kwargs)


def test_words_dir_loading_and_all_lang(tmp_path, spark):
    """stopwords_dir/flagged_words_dir load merged {lang: [words]} json
    files named like the asset type (load_words_asset parity,
    utils/asset_utils.py:19-41); lang='all' unions every language."""
    import json

    d = tmp_path / "assets"
    d.mkdir()
    (d / "my_stopwords.json").write_text(json.dumps({"en": ["zzfoo"]}))
    (d / "more_stopwords.json").write_text(json.dumps({"en": ["zzbar"],
                                                       "xx": ["zzbaz"]}))
    (d / "unrelated.json").write_text(json.dumps({"en": ["NOPE"]}))
    op = OPERATORS.get("stopwords_filter")(min_ratio=0.0,
                                           stopwords_dir=str(d), lang="all")
    assert set(op.stopwords) == {"zzfoo", "zzbar", "zzbaz"}
    op_en = OPERATORS.get("stopwords_filter")(min_ratio=0.0,
                                              stopwords_dir=str(d),
                                              lang="en")
    assert set(op_en.stopwords) == {"zzfoo", "zzbar"}
    # an explicitly supplied dir that yields nothing falls back to the
    # built-in table (the reference would DOWNLOAD the standard lists
    # there — its config_all.yaml ships words_dir='./assets') but must
    # WARN loudly so a typo'd path can't silently change keep/drop
    import pytest

    with pytest.warns(UserWarning, match="built-in stopwords table"):
        op_fb = OPERATORS.get("stopwords_filter")(
            min_ratio=0.0, stopwords_dir=str(tmp_path / "nope"))
    assert "the" in op_fb.stopwords
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.warns(UserWarning, match="no '\\*\\.json'"):
        op_fb = OPERATORS.get("stopwords_filter")(
            min_ratio=0.0, stopwords_dir=str(empty))
    assert "the" in op_fb.stopwords
    # no dir supplied → built-in table, no warning
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        op_fb = OPERATORS.get("stopwords_filter")(min_ratio=0.0)
    assert "the" in op_fb.stopwords


def test_audio_duration_reference_names_and_any_all(spark):
    """reference param names (min_duration/max_duration) and the
    any/all fold over array payloads (audio_duration_filter.py:28-75);
    no-audio samples are kept like the reference's empty-stats path."""
    rows = [
        (0, [bytearray(b"x" * 32000)]),                       # 1 s
        (1, [bytearray(b"x" * 32000), bytearray(b"x" * 320000)]),  # 1s,10s
        (2, []),                                              # no audio
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, audio array<binary>")
    any_op = OPERATORS.get("audio_duration_filter")(
        min_duration=0.5, max_duration=2.0)
    all_op = OPERATORS.get("audio_duration_filter")(
        min_duration=0.5, max_duration=2.0, any_or_all="all")
    assert sorted(r["id"] for r in any_op.apply(df).collect()) == [0, 1, 2, 3]
    assert sorted(r["id"] for r in all_op.apply(df).collect()) == [0, 2, 3]
    # engine aliases still work
    alias = OPERATORS.get("audio_duration_filter")(min_seconds=5.0,
                                                   max_seconds=20.0)
    assert sorted(r["id"] for r in alias.apply(df).collect()) == [1, 2, 3]


def test_image_shape_any_all_over_multi_image_samples(spark):
    meta = "array<struct<width:int,height:int,n_channels:int," \
           "format:string,decode_error:string>>"
    rows = [
        (0, [(32, 32, 3, "fake", None)]),
        (1, [(32, 32, 3, "fake", None), (500, 32, 3, "fake", None)]),
        (2, []),
    ]
    df = spark.createDataFrame(rows, f"id long, image_meta {meta}")
    any_op = OPERATORS.get("image_shape_filter")(max_width=64)
    all_op = OPERATORS.get("image_shape_filter")(max_width=64,
                                                 any_or_all="all")
    assert sorted(r["id"] for r in any_op.apply(df).collect()) == [0, 1, 2]
    assert sorted(r["id"] for r in all_op.apply(df).collect()) == [0, 2]


def test_model_dep_params_fail_loudly_not_silently(spark):
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        OPERATORS.get("text_chunk_mapper")(max_len=10, tokenizer="gpt2")
    with _pytest.raises(NotImplementedError):
        OPERATORS.get("document_minhash_deduplicator")(
            tokenizer_model="sp.model")
    with _pytest.raises(NotImplementedError):
        OPERATORS.get("image_blur_mapper")(save_dir="/tmp/x")
    with _pytest.raises(NotImplementedError):
        OPERATORS.get("audio_add_gaussian_noise_mapper")(save_dir="/tmp/x")
    with _pytest.raises(NotImplementedError):
        OPERATORS.get("text_embd_similarity_filter")(
            api_endpoint="http://x/v1/embeddings")
    # advisory params construct fine
    OPERATORS.get("perplexity_filter")(lang="fr")
    OPERATORS.get("sentence_split_mapper")(lang="fr")
    OPERATORS.get("flagged_words_filter")(min_ratio=0.01, max_ratio=0.5)
    OPERATORS.get("text_pair_similarity_filter")(
        text_key_second="embedding2", any_or_all="any")


def test_refined_words_randomized_parity(spark):
    """Randomized fence (fixed seed, one batched job): refined_words
    and num_words must match a sequential python port of the
    reference's words_refinement on adversarial texts — special-char
    runs, CJK, astral emoji (never stripped: not in the all-BMP set),
    mixed whitespace, empty and pure-special words."""
    import random

    from data_juicer_spark.functions.text import (
        SPECIAL_CHARACTERS, num_words, refined_words,
    )

    rng = random.Random(1234)
    alphabet = (
        list("abcXYZ09") + list(".,;!?-–…«»") + list("中文字テスト")
        + ["😀", "🚀"] + list(" \t\n") + [" ", "​"]
    )
    texts = ["".join(rng.choice(alphabet)
                     for _ in range(rng.randint(0, 60)))
             for _ in range(200)] + ["", "...", " -- ", "a.b.c"]

    def py_refined(text):
        ws = [w for w in text.replace("\n", " ").replace("\t", " ")
              .split(" ") if w != ""]
        ws = [w.lower() for w in ws]
        out = []
        for w in ws:
            i, j = 0, len(w)
            while i < j and w[i] in SPECIAL_CHARACTERS:
                i += 1
            while j > i and w[j - 1] in SPECIAL_CHARACTERS:
                j -= 1
            if w[i:j]:
                out.append(w[i:j])
        return out

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id long, text string")
    rows = df.select(
        "id", refined_words(F.col("text")).alias("rw"),
        num_words(F.col("text")).alias("nw")).collect()
    for r in rows:
        want = py_refined(texts[r["id"]])
        assert list(r["rw"]) == want, (texts[r["id"]], list(r["rw"]), want)
        assert r["nw"] == len(want), (texts[r["id"]], r["nw"], len(want))
