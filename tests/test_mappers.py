"""Mapper golden tests — input/expected string pairs per op, mirroring
the reference's tests/ops/mapper pattern."""

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS


def run_mapper(spark, name, texts, **params):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    out = OPERATORS.get(name)(**params).apply(df)
    return [r["text"] for r in out.orderBy("id").collect()]


def test_whitespace_normalization(spark):
    assert run_mapper(spark, "whitespace_normalization_mapper",
                      ["  hello world ! ", "a\tb"]) == \
        ["hello world !", "a b"]


def test_punctuation_normalization(spark):
    assert run_mapper(spark, "punctuation_normalization_mapper",
                      ["hello，world。", "“quoted”…"]) == \
        ["hello,world.", '"quoted"...']


def test_clean_email(spark):
    assert run_mapper(spark, "clean_email_mapper",
                      ["contact me at dev@example.com now"]) == \
        ["contact me at  now"]


def test_clean_ip(spark):
    assert run_mapper(spark, "clean_ip_mapper",
                      ["ping 192.168.1.100 ok"]) == ["ping  ok"]


def test_clean_links(spark):
    assert run_mapper(spark, "clean_links_mapper",
                      ["see https://example.com/a?b=1 and www.test.org rest"]) == \
        ["see  and  rest"]


def test_clean_copyright(spark):
    code = "/* Copyright (c) 2020 ACME */\nint main() { return 0; }\n"
    out = run_mapper(spark, "clean_copyright_mapper", [code])
    assert "Copyright" not in out[0]
    assert "int main()" in out[0]
    # leading comment lines are stripped GREEDILY and unconditionally
    # (reference :48-55 — most such headers are copyright banners)
    code2 = "# some header\n// another\nprint('hi')\n"
    out2 = run_mapper(spark, "clean_copyright_mapper", [code2])
    assert out2[0] == "print('hi')\n"
    # non-copyright block comments survive, and the block path RETURNS
    # without touching leading comment lines
    code3 = "/* keep this */\nint x;\n"
    assert run_mapper(spark, "clean_copyright_mapper", [code3])[0] == code3
    code4 = "// leading comment\n/* no c-word */\nbody"
    assert run_mapper(spark, "clean_copyright_mapper", [code4])[0] == code4


def test_remove_long_words(spark):
    assert run_mapper(spark, "remove_long_words_mapper",
                      ["a bb ccc dddd eeeee"], min_len=2, max_len=4) == \
        ["bb ccc dddd"]


def test_replace_content(spark):
    assert run_mapper(spark, "replace_content_mapper",
                      ["foo bar foo"], pattern="foo", repl="baz") == \
        ["baz bar baz"]
    assert run_mapper(spark, "replace_content_mapper",
                      ["a1b2"], pattern=[r"\d", "b"], repl=["", "X"]) == ["aX"]


def test_remove_specific_chars(spark):
    assert run_mapper(spark, "remove_specific_chars_mapper",
                      ["a◆b●c"], chars_to_remove="◆●") == ["abc"]


def test_fix_unicode(spark):
    # NFKC folds the ﬁ ligature
    assert run_mapper(spark, "fix_unicode_mapper", ["ﬁle"], normalization="NFKC") == ["file"]


def test_sentence_split(spark):
    assert run_mapper(spark, "sentence_split_mapper",
                      ["One. Two! Three?"]) == ["One.\nTwo!\nThree?"]


def test_remove_repeat_sentences(spark):
    text = "Hello there. Some news. Hello there. More text."
    out = run_mapper(spark, "remove_repeat_sentences_mapper", [text])
    assert out[0].count("Hello there.") == 1


def test_remove_words_with_incorrect_substrings(spark):
    assert run_mapper(spark, "remove_words_with_incorrect_substrings_mapper",
                      ["see http://x.com for info"]) == ["see for info"]


def test_text_chunk_mapper(spark):
    df = spark.createDataFrame([(0, "abcdefghij")], ["id", "text"])
    op = OPERATORS.get("text_chunk_mapper")(max_len=4, split_pattern=None)
    out = op.apply(df).orderBy("chunk_id").collect()
    assert [r["text"] for r in out] == ["abcd", "efgh", "ij"]
    assert [r["chunk_id"] for r in out] == [0, 1, 2]


def test_remove_comments(spark):
    tex = "% full line comment\nkeep this\n"
    out = run_mapper(spark, "remove_comments_mapper", [tex])
    assert out[0] == "keep this\n"


def test_remove_bibliography(spark):
    tex = "body text\n\\begin{thebibliography}{9}\\bibitem{x} X.\\end{thebibliography}"
    assert run_mapper(spark, "remove_bibliography_mapper", [tex]) == ["body text\n"]


def test_remove_non_chinese_character(spark):
    assert run_mapper(spark, "remove_non_chinese_character_mapper",
                      ["中文abc123。×"], keep_alphabet=True, keep_number=True,
                      keep_punc=False) == ["中文abc123"]


def test_python_lambda_mapper(spark):
    out = run_mapper(spark, "python_lambda_mapper", ["abc"],
                     fn=lambda s: s.str.upper())
    assert out == ["ABC"]


def test_clean_html(spark):
    assert run_mapper(spark, "clean_html_mapper",
                      ["<p>Hello <b>world</b></p>",
                       "<li>one</li><ol>two</ol>",
                       "a &amp; b &lt;c&gt; &nbsp;d"]) == \
        ["Hello world", "*one\n*two", "a & b <c>  d"]  # leading ws dropped like the parser


def test_expand_macro(spark):
    # reference semantics (expand_macro_mapper.py:31-91): definition must
    # end its line; expansion rewrites every occurrence INCLUDING the
    # definition braces, keeping the following non-alnum char
    tex = "\\newcommand{\\x}{spark engine}\nuses \\x and \\x again."
    out = run_mapper(spark, "expand_macro_mapper", [tex])
    assert out == [
        "\\newcommand{spark engine}{spark engine}\n"
        "uses spark engine and spark engine again."
    ]


def test_remove_table_text(spark):
    doc = "before\nc1 c2\nd1 d2\ne1 e2\nafter"
    assert run_mapper(spark, "remove_table_text_mapper", [doc]) == \
        ["before\nafter"]


def test_remove_header(spark):
    doc = "preamble stuff \\section{Intro} body"
    assert run_mapper(spark, "remove_header_mapper", [doc]) == \
        ["\\section{Intro} body"]


def test_fix_unicode_mojibake(spark):
    good = "Caf\u00e9 \u2014 na\u00efve ok"
    bad = good.encode("utf-8").decode("latin-1")      # single mojibake
    double = bad.encode("utf-8").decode("latin-1")    # double mojibake
    out = run_mapper(spark, "fix_unicode_mapper", [bad, double, good, "plain"])
    assert out == [good, good, good, "plain"]


def test_fix_unicode_mojibake_off(spark):
    bad = "Caf\u00e9".encode("utf-8").decode("latin-1")
    out = run_mapper(spark, "fix_unicode_mapper", [bad], fix_mojibake=False)
    assert out == [bad]  # repair disabled: NFC only


def test_chinese_convert(spark):
    assert run_mapper(spark, "chinese_convert_mapper",
                      ["汉语学习电脑问题", "plain ascii"], mode="s2t") == \
        ["漢語學習電腦問題", "plain ascii"]
    assert run_mapper(spark, "chinese_convert_mapper",
                      ["漢語學習"], mode="t2s") == ["汉语学习"]
