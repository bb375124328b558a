"""Hand-ported reference goldens for filters whose machine-ported
fixture coverage was thin: suffix (tests/ops/filter/
test_suffix_filter.py:20-75), specified_numeric_field
(test_specified_numeric_field_filter.py:24-80, incl. the nested
`meta.star` field key), alphanumeric char mode
(test_alphanumeric_filter.py:10-41)."""

from __future__ import annotations

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

SUFFIX_ROWS = [("Today is Sun", ".pdf"),
               ("a v s e c s f e f g a a a  ", ".docx"),
               ("中文也是一个字算一个长度", ".txt"),
               ("，。、„”“«»１」「《》´∶：？！", ".html"),
               ("dasdasdasdasdasdasdasd", ".py")]


def test_suffix_filter_golden(spark):
    df = spark.createDataFrame(SUFFIX_ROWS, "text string, suffix string")
    op = OPERATORS.get("suffix_filter")(suffixes=[".txt", ".pdf"])
    got = sorted(r["text"] for r in op.apply(df).collect())
    assert got == sorted(["Today is Sun", "中文也是一个字算一个长度"])


def test_suffix_filter_none_case(spark):
    # no suffixes configured → keep everything (reference test_none_case)
    df = spark.createDataFrame(SUFFIX_ROWS, "text string, suffix string")
    op = OPERATORS.get("suffix_filter")(suffixes=[])
    assert op.apply(df).count() == 5


def test_specified_numeric_field_nested_key(spark):
    rows = [("Today is Sun", (".pdf", 50.0)),
            ("a v s e c s f e f g a a a  ", (".docx", 6.0)),
            ("中文也是一个字算一个长度", (".txt", 100.0)),
            ("，。、„”“«»１」「《》´∶：？！", (".html", 12.51)),
            ("dasdasdasdasdasdasdasd", (None, None))]
    df = spark.createDataFrame(
        rows, "text string, meta struct<suffix:string,star:double>")
    op = OPERATORS.get("specified_numeric_field_filter")(
        field_key="meta.star", min_value=10, max_value=70)
    got = sorted(r["text"] for r in op.apply(df).collect())
    assert got == sorted(["Today is Sun", "，。、„”“«»１」「《》´∶：？！"])


def test_alphanumeric_filter_char_golden(spark):
    texts = ["a=1\nb\nc=1+2+3+5\nd=6",
             "Today is Sund Sund Sund Sunda and it's a happy day!\nYou know",
             "a v s e e f g a qkc",
             "，。、„”“«»１」「《》´∶：？！（）；–—．～’…━〈〉【】％►",
             "Do you need a cup of coffee?",
             "emoji表情测试下😊，😸31231\n"]
    expected = [t for t in texts
                if t != "，。、„”“«»１」「《》´∶：？！（）；–—．～’…━〈〉【】％►"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    op = OPERATORS.get("alphanumeric_filter")(min_ratio=0.2, max_ratio=0.9)
    got = sorted(r["text"] for r in op.apply(df).collect())
    assert got == sorted(expected)


def test_filter_strategy_kwargs(spark):
    """Reference filter-strategy kwargs (base_op.py:427-443): open
    intervals and reversed_range work on every range filter."""
    df = spark.createDataFrame(
        [(1, "x" * 10), (2, "x" * 15), (3, "x" * 30)],
        "id long, text string")
    mk = OPERATORS.get("text_length_filter")
    # closed (default): 10 and 15 kept
    got = sorted(r["id"] for r in
                 mk(min_len=10, max_len=20).apply(df).collect())
    assert got == [1, 2]
    # open min interval: 10 excluded
    got = sorted(r["id"] for r in
                 mk(min_len=10, max_len=20,
                    min_closed_interval=False).apply(df).collect())
    assert got == [2]
    # reversed: keep NOT(min < v < max) — the reference flips the
    # closedness, so the boundary value 10 stays kept (base_op.py:441-443)
    got = sorted(r["id"] for r in
                 mk(min_len=10, max_len=20,
                    reversed_range=True).apply(df).collect())
    assert got == [1, 3]


def test_specified_field_filter_list_values(spark):
    # list-valued field keeps only rows where ALL elements are targets
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a", "z"]), (3, []), (4, ["b"])],
        "id long, tags array<string>")
    op = OPERATORS.get("specified_field_filter")(
        field_key="tags", target_value=["a", "b"])
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [1, 3, 4]  # empty list vacuously passes, like all()
    rev = OPERATORS.get("specified_field_filter")(
        field_key="tags", target_value=["a", "b"], reversed_range=True)
    assert sorted(r["id"] for r in rev.apply(df).collect()) == [2]


def test_specified_field_filter_empty_config_keeps_all(spark):
    df = spark.createDataFrame([(1, "x")], "id long, field string")
    op = OPERATORS.get("specified_field_filter")(field_key="field")
    assert op.apply(df).count() == 1


def test_specified_numeric_string_values(spark):
    # numeric strings parse as floats; non-numbers drop (is_number)
    df = spark.createDataFrame(
        [(1, "50"), (2, "12.51"), (3, "abc"), (4, None), (5, "100")],
        "id long, star string")
    op = OPERATORS.get("specified_numeric_field_filter")(
        field_key="star", min_value=10, max_value=70)
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [1, 2]


def test_general_field_filter_python_grammar(spark):
    """Reference condition grammar: chained comparisons, and/or,
    dotted names (general_field_filter.py:26 example)."""
    df = spark.createDataFrame(
        [(1, 20, "hello", (3,)), (2, 40, "hello", (3,)),
         (3, 20, "nothing here", (3,)), (4, 20, "hello", (9,))],
        "id long, num long, text string, meta struct<a:long>")
    op = OPERATORS.get("general_field_filter")(
        filter_condition="10 < num <= 30 and text != 'nothing here' "
                         "and meta.a == 3")
    got = sorted(r["id"] for r in op.apply(df).collect())
    assert got == [1]
    # empty condition keeps everything
    assert OPERATORS.get("general_field_filter")().apply(df).count() == 4
    # SQL superset still works (falls back to expr)
    sql = OPERATORS.get("general_field_filter")(
        filter_condition="num % 40 = 0 AND text LIKE 'hel%'")
    assert sorted(r["id"] for r in sql.apply(df).collect()) == [2]


def test_general_field_filter_reference_goldens(spark):
    """Ports tests/ops/filter/test_general_field_filter.py:21-84."""
    df = spark.createDataFrame(
        [("sample1", 5, True, (1,)), ("sample2", 15, False, (2,)),
         ("sample3", 25, True, (3,))],
        "text string, num long, flag boolean, meta struct<a:long>")
    mk = OPERATORS.get("general_field_filter")

    def texts(cond):
        return sorted(r["text"] for r in
                      mk(filter_condition=cond).apply(df).collect())

    assert texts("10 < num < 20") == ["sample2"]
    assert texts("num < 10 and flag == True") == ["sample1"]
    assert texts("num < 10 or num > 20") == ["sample1", "sample3"]
    assert texts("meta.a == 2") == ["sample2"]
    # null field: comparison is null → dropped (reference missing-key row)
    df2 = spark.createDataFrame(
        [("sample1", 5), ("sample2", None), ("sample3", 25)],
        "text string, num long")
    got = sorted(r["text"] for r in mk(filter_condition="num <= 5")
                 .apply(df2).collect())
    assert got == ["sample1"]


def test_specified_field_filter_reference_goldens(spark):
    """Ports tests/ops/filter/test_specified_field_filter.py: scalar
    case with empty/None values and the deep-nested list case."""
    mk = OPERATORS.get("specified_field_filter")
    df = spark.createDataFrame(
        [(0, (".pdf",)), (1, (".docx",)), (2, (".txt",)), (3, ("",)),
         (4, (None,))],
        "id long, meta struct<suffix:string>")
    op = mk(field_key="meta.suffix", target_value=[".pdf", ".txt"])
    assert sorted(r["id"] for r in op.apply(df).collect()) == [0, 2]

    df2 = spark.createDataFrame(
        [(0, ((["txt", "json"],),)), (1, ((["pdf", "txt", "xbs"],),)),
         (2, ((["docx", "", "html"],),)), (3, ((["json"],),)),
         (4, ((["pdf", "txt", "json", "docx"],),))],
        "id long, meta struct<path:struct<test:array<string>>>")
    op2 = mk(field_key="meta.path.test",
             target_value=["pdf", "txt", "json"])
    # row 4 has 'docx' → not all elements are targets → dropped
    assert sorted(r["id"] for r in op2.apply(df2).collect()) == [0, 3]


def test_stopwords_filter_reference_en_case(spark):
    """Ports tests/ops/filter/test_stopwords_filter.py:test_en_case
    (lang='en', min_ratio=0.3). Keep/drop hinges on the EN list
    containing contractions: row 2 has exactly 4/12 refined words in
    the list ("is", "and", "it's", "a" → 0.333 ≥ 0.3) — the list
    enrichment that made this pass is wordlists.py's contractions
    block. zh_case needs tokenization=True (sentencepiece model dep,
    loudly guarded) and is not portable."""
    rows = ["Today is Sunday and it's a happy day!",
            "Today is Sund Sund Sund Sund Sunda and it's a happy day!",
            "a v s e c s f e f g a qkc",
            "，。、„”“«»１」「《》´∶：？！（）；–—．～’…━〈〉【】％►",
            "Do you need a cup of coffee?"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               "i long, text string")
    op = OPERATORS.get("stopwords_filter")(lang="en", min_ratio=0.3)
    kept = sorted(r["i"] for r in op.apply(df).collect())
    assert kept == [0, 1, 4]


def test_flagged_words_filter_reference_en_case(spark):
    """Ports tests/ops/filter/test_flagged_words_filter.py:test_en_case
    (lang='en', max_ratio=0.045): rows with any flagged word exceed
    4.5% and drop; punctuation-only, clean-English and emoji rows
    stay. zh_case needs tokenization=True (model dep)."""
    rows = ["Today is anal cumshot day",
            "Fuck you doggystyle!",
            "，。、„”“«»１」「《》´∶：？！（）；–—．～’…━〈〉【】％►",
            "Do you need a cup of coffee?",
            "emoji表情测试下😊，😸31231\n"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)],
                               "i long, text string")
    op = OPERATORS.get("flagged_words_filter")(lang="en", max_ratio=0.045)
    kept = sorted(r["i"] for r in op.apply(df).collect())
    assert kept == [2, 3, 4]
