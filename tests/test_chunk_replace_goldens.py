"""Reference-golden ports for text_chunk_mapper (1→N, all three modes:
tests/ops/mapper/test_text_chunk_mapper.py:18-190) and
replace_content_mapper (test_replace_content_mapper.py:17-60). The
chunk cases need flattened (row-order-preserving) comparison, which the
generic golden harness doesn't do."""

from __future__ import annotations

import pytest

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

FR = ("Sur la plateforme MT4, plusieurs manières d'accéder à "
      "ces fonctionnalités sont conçues simultanément.")
FR_NL = ("Sur la plateforme MT4, plusieurs manières d'accéder à \n"
         "ces fonctionnalités sont conçues simultanément.")
EN = "Today is Sunday and it's a happy day!"
ZH = "欢迎来到阿里巴巴！"

CHUNK_CASES = [
    # (kwargs, ds_list, flattened tgt_list)
    (dict(split_pattern="\n"),
     [EN, FR_NL, ZH],
     [EN, "Sur la plateforme MT4, plusieurs manières d'accéder à ",
      "ces fonctionnalités sont conçues simultanément.", ZH]),
    (dict(max_len=20, split_pattern=None),
     [EN, FR, ZH],
     ["Today is Sunday and ", "it's a happy day!",
      "Sur la plateforme MT", "4, plusieurs manière", "s d'accéder à ces fo",
      "nctionnalités sont c", "onçues simultanément", ".", ZH]),
    (dict(max_len=20, overlap_len=2),  # default split_pattern \n\n: no match
     [EN, FR, ZH],
     ["Today is Sunday and ", "d it's a happy day!",
      "Sur la plateforme MT", "MT4, plusieurs maniè", "ières d'accéder à ce",
      "ces fonctionnalités ", "s sont conçues simul", "ultanément.", ZH]),
    (dict(max_len=20, overlap_len=2, split_pattern="\n"),
     [EN, FR_NL, ZH],
     ["Today is Sunday and ", "d it's a happy day!",
      "Sur la plateforme MT", "MT4, plusieurs maniè", "ières d'accéder à ",
      "ces fonctionnalités ", "s sont conçues simul", "ultanément.", ZH]),
]


@pytest.mark.parametrize("case_id", range(len(CHUNK_CASES)))
def test_text_chunk_reference_goldens(spark, case_id):
    kwargs, ds, tgt = CHUNK_CASES[case_id]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ds)], "id long, text string")
    op = OPERATORS.get("text_chunk_mapper")(text_key="text", **kwargs)
    rows = op.apply(df).orderBy("id", "chunk_id").collect()
    assert [r["text"] for r in rows] == tgt


REPLACE_CASES = [
    (dict(pattern="●■", repl="<SPEC>"),
     ["这是一个干净的文本。Including Chinese and English.",
      "◆●■►▼▲▴∆▻▷❖♡□",
      "多个●■►▼这样的特殊字符可以►▼▲▴∆吗？",
      "未指定的●■☛₨➩►▼▲特殊字符会☻▷❖被删掉吗？？"],
     ["这是一个干净的文本。Including Chinese and English.",
      "◆<SPEC>►▼▲▴∆▻▷❖♡□",
      "多个<SPEC>►▼这样的特殊字符可以►▼▲▴∆吗？",
      "未指定的<SPEC>☛₨➩►▼▲特殊字符会☻▷❖被删掉吗？？"]),
    (dict(pattern=r"\d+(?:,\d+)*", repl="<DIGIT>"),
     ["这是一个123。Including 456 and English."],
     ["这是一个<DIGIT>。Including <DIGIT> and English."]),
]


SENTENCE_CASES = [
    ("en",
     "Smithfield employs 3,700 people at its plant in Sioux Falls, "
     "South Dakota. The plant slaughters 19,500 pigs a day — 5 "
     "percent of U.S. pork.",
     "Smithfield employs 3,700 people at its plant in Sioux Falls, "
     "South Dakota.\nThe plant slaughters 19,500 pigs a day — 5 "
     "percent of U.S. pork."),
    ("fr",
     "Smithfield emploie 3,700 personnes dans son usine de Sioux "
     "Falls, dans le Dakota du Sud. L'usine abat 19 500 porcs par "
     "jour, soit 5 % du porc américain.",
     "Smithfield emploie 3,700 personnes dans son usine de Sioux "
     "Falls, dans le Dakota du Sud.\nL'usine abat 19 500 porcs par "
     "jour, soit 5 % du porc américain."),
    ("pt",
     "A Smithfield emprega 3.700 pessoas em sua fábrica em Sioux "
     "Falls, Dakota do Sul. A fábrica abate 19.500 porcos por dia – "
     "5% da carne suína dos EUA.",
     "A Smithfield emprega 3.700 pessoas em sua fábrica em Sioux "
     "Falls, Dakota do Sul.\nA fábrica abate 19.500 porcos por dia – "
     "5% da carne suína dos EUA."),
    ("es",
     "Smithfield emplea a 3.700 personas en su planta de Sioux "
     "Falls, Dakota del Sur. La planta sacrifica 19.500 cerdos al "
     "día, el 5 por ciento de la carne de cerdo de EE.",
     "Smithfield emplea a 3.700 personas en su planta de Sioux "
     "Falls, Dakota del Sur.\nLa planta sacrifica 19.500 cerdos al "
     "día, el 5 por ciento de la carne de cerdo de EE."),
]


@pytest.mark.parametrize("lang,text,want",
                         SENTENCE_CASES, ids=[c[0] for c in SENTENCE_CASES])
def test_sentence_split_reference_goldens(spark, lang, text, want):
    """tests/ops/mapper/test_sentence_split_mapper.py:18-82 — incl. the
    dotted-acronym case (U.S.) punkt handles via its abbreviation model."""
    df = spark.createDataFrame([(0, text)], "id long, text string")
    op = OPERATORS.get("sentence_split_mapper")(lang=lang, text_key="text")
    assert op.apply(df).first()["text"] == want


@pytest.mark.parametrize("case_id", range(len(REPLACE_CASES)))
def test_replace_content_reference_goldens(spark, case_id):
    kwargs, ds, tgt = REPLACE_CASES[case_id]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ds)], "id long, text string")
    op = OPERATORS.get("replace_content_mapper")(text_key="text", **kwargs)
    got = [r["text"] for r in op.apply(df).orderBy("id").collect()]
    assert got == tgt
