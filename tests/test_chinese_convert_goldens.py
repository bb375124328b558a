"""Reference-golden parity for chinese_convert_mapper across all 14
opencc configs (ported from the reference's own unit test,
tests/ops/mapper/test_chinese_convert_mapper.py:22-231). Round 2 only
shipped s2t/t2s char tables; these goldens pin the full mode surface
(phrase tables, TW/HK variants, Japanese shinjitai) bit-exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import data_juicer_spark.operators  # noqa: F401
from data_juicer_spark.registry import OPERATORS

CASES = {
    "s2t": [
        ("这是几个简体字，会被转换为繁体字", "這是幾個簡體字，會被轉換爲繁體字"),
        ("如果本身都是繁體字就不會被轉換", "如果本身都是繁體字就不會被轉換"),
        ("试试繁体afadf字$#@#和简体字，以及各123213*&dasd種不同字符数字的组合轉換效果",
         "試試繁體afadf字$#@#和簡體字，以及各123213*&dasd種不同字符數字的組合轉換效果"),
    ],
    "t2s": [
        ("這是幾個繁體字，會被轉換爲簡體字", "这是几个繁体字，会被转换为简体字"),
        ("如果本身都是简体字，就不会被转换", "如果本身都是简体字，就不会被转换"),
        ("试试繁体afadf字$#@#和简体字，以及各123213*&dasd種不同字符数字的组合轉換效果",
         "试试繁体afadf字$#@#和简体字，以及各123213*&dasd种不同字符数字的组合转换效果"),
    ],
    "s2tw": [
        ("群贤毕至，少长咸集", "群賢畢至，少長鹹集"),
        ("为你我用了半年的积蓄，漂洋过海来看你", "為你我用了半年的積蓄，漂洋過海來看你"),
        ("米线面粉里面启发吊钩", "米線麵粉裡面啟發吊鉤"),
    ],
    "tw2s": [
        ("群賢畢至，少長鹹集", "群贤毕至，少长咸集"),
        ("為你我用了半年的積蓄，漂洋過海來看你", "为你我用了半年的积蓄，漂洋过海来看你"),
        ("米線麵粉裡面啟發吊鉤", "米线面粉里面启发吊钩"),
    ],
    "s2hk": [
        ("群贤毕至，少长咸集", "羣賢畢至，少長鹹集"),
        ("为你我用了半年的积蓄，漂洋过海来看你", "為你我用了半年的積蓄，漂洋過海來看你"),
        ("米线面粉里面启发吊钩", "米線麪粉裏面啓發吊鈎"),
    ],
    "hk2s": [
        ("羣賢畢至，少長鹹集", "群贤毕至，少长咸集"),
        ("為你我用了半年的積蓄，漂洋過海來看你", "为你我用了半年的积蓄，漂洋过海来看你"),
        ("米線麪粉裏面啓發吊鈎", "米线面粉里面启发吊钩"),
    ],
    "s2twp": [
        ("网络连接异常，请检查信息安全", "網路連線異常，請檢查資訊安全"),
        ("今年想去新西兰和马尔代夫旅游", "今年想去紐西蘭和馬爾地夫旅遊"),
        ("我打个出租车打到了一辆奔驰，准备在车上吃冰棍和奶酪",
         "我打個計程車打到了一輛賓士，準備在車上吃冰棒和乳酪"),
    ],
    "tw2sp": [
        ("網路連線異常，請檢查資訊保安", "网络连接异常，请检查信息保安"),
        ("今年想去紐西蘭和馬爾地夫旅遊", "今年想去新西兰和马尔代夫旅游"),
        ("我打個計程車打到了一輛賓士，準備在車上吃冰棒和乳酪",
         "我打个出租车打到了一辆奔驰，准备在车上吃冰棍和奶酪"),
    ],
    "t2tw": [
        ("羣賢畢至，少長鹹集", "群賢畢至，少長鹹集"),
        ("爲你我用了半年的積蓄，漂洋過海來看你", "為你我用了半年的積蓄，漂洋過海來看你"),
        ("米線麪粉裏面啓發吊鉤", "米線麵粉裡面啟發吊鉤"),
    ],
    "tw2t": [
        ("群賢畢至，少長鹹集", "羣賢畢至，少長鹹集"),
        ("為你我用了半年的積蓄，漂洋過海來看你", "爲你我用了半年的積蓄，漂洋過海來看你"),
        ("米線麵粉裡面啟發吊鈎", "米線麪粉裏面啓發吊鈎"),
    ],
    "t2hk": [
        ("說他癡人說夢,他深感不悅", "説他痴人説夢,他深感不悦"),
        ("爲你我用了半年的積蓄，漂洋過海來看你", "為你我用了半年的積蓄，漂洋過海來看你"),
        ("一隻憂鬱的臺灣烏龜", "一隻憂鬱的台灣烏龜"),
    ],
    "hk2t": [
        ("説他痴人説夢,他深感不悦", "說他癡人說夢,他深感不悅"),
        ("為你我用了半年的積蓄，漂洋過海來看你", "爲你我用了半年的積蓄，漂洋過海來看你"),
        ("一隻憂鬱的台灣烏龜", "一隻憂鬱的臺灣烏龜"),
    ],
    "t2jp": [
        ("他需要修復心臟瓣膜", "他需要修復心臓弁膜"),
        ("舊字體歷史假名遣 新字體現代假名遣", "旧字体歴史仮名遣 新字体現代仮名遣"),
        ("藝術 缺航 飲料罐", "芸術 欠航 飲料缶"),
    ],
    "jp2t": [
        ("他需要修復心臓弁膜", "他需要修復心臟瓣膜"),
        ("旧字体歴史仮名遣 新字体現代仮名遣", "舊字體歷史假名遣 新字體現代假名遣"),
        ("芸術 欠航 飲料缶", "藝術 缺航 飲料罐"),
    ],
}


@pytest.mark.parametrize("mode", sorted(CASES))
def test_chinese_convert_reference_goldens(spark, mode):
    cases = CASES[mode]
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(cases)], "id long, text string")
    op = OPERATORS.get("chinese_convert_mapper")(mode=mode, text_key="text")
    got = {r["id"]: r["text"]
           for r in op.apply(df).select("id", "text").collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, f"{mode} case {i}: {got[i]!r} != {want!r}"


def test_chinese_convert_rejects_unknown_mode():
    with pytest.raises(ValueError, match="unsupported mode"):
        OPERATORS.get("chinese_convert_mapper")(mode="s2x")


def test_chinese_convert_stays_jvm_side(spark):
    """The whole mode pipeline must compile to JVM expressions (no
    BatchEvalPython / ArrowEvalPython in the plan)."""
    df = spark.createDataFrame([(0, "软件和网络")], "id long, text string")
    op = OPERATORS.get("chinese_convert_mapper")(mode="s2twp",
                                                 text_key="text")
    plan = op.apply(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan