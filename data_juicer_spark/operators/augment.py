"""Text-augmentation mappers — hermetic nlpaug/nlpcda counterparts.

The reference wraps the nlpaug / nlpcda libraries
(mapper/nlpaug_en_mapper.py:19-170, mapper/nlpcda_zh_mapper.py:17-120);
both are pure-python perturbation libraries, not models, so the same
METHOD SURFACE is implemented here directly: identical constructor
params (sequential / aug_num / keep_original_sample / per-method
flags) and the same 1→N output contract (original kept + aug_num
augmented rows per enabled method, or aug_num total when sequential).

Deviations (documented): the perturbation RNG is this engine's own —
seeded per (text, method, variant) with a stable hash, so results are
deterministic, shuffle-independent and resumable, which the reference's
global library RNG is not — and the zh similar-word / homophone /
spelling tables are compact in-repo lists rather than nlpcda's
dictionary files.

Spark shape: ONE vectorized pandas UDF computes the augmented-text
array per row; posexplode fans out 1→N with every other column
replicated by the explode itself — no driver loop, no Python row-at-a-
time path.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from data_juicer_spark.operators.base import Mapper
from data_juicer_spark.registry import OPERATORS

AUG_P = 0.3  # nlpaug's default word/char perturbation rate


def _rng(text: str, method: str, k: int) -> np.random.RandomState:
    h = hashlib.md5(f"{method}|{k}|{text}".encode()).digest()
    return np.random.RandomState(int.from_bytes(h[:4], "little"))


def _pick(rng, n, p=AUG_P, at_least=1):
    take = max(int(round(n * p)), at_least)
    return set(rng.choice(n, size=min(take, n), replace=False)) if n else set()


# -- English word/char methods (nlpaug_en_mapper.py method set) ----------

_KEYBOARD = {
    "q": "wa", "w": "qes", "e": "wrd", "r": "etf", "t": "ryg", "y": "tuh",
    "u": "yij", "i": "uok", "o": "ipl", "p": "ol", "a": "qsz", "s": "awdx",
    "d": "sefc", "f": "drgv", "g": "fthb", "h": "gyjn", "j": "hukm",
    "k": "jil", "l": "kop", "z": "asx", "x": "zsdc", "c": "xdfv",
    "v": "cfgb", "b": "vghn", "n": "bhjm", "m": "njk",
}
_OCR = {"0": "O", "O": "0", "1": "l", "l": "1", "5": "S", "S": "5",
        "8": "B", "B": "8", "2": "Z", "Z": "2", "6": "G", "G": "6",
        "9": "g", "g": "9", "I": "1", "i": "!", "D": "O"}
_SPELLING = {
    "the": "teh", "and": "adn", "with": "wiht", "their": "thier",
    "receive": "recieve", "believe": "beleive", "because": "becuase",
    "which": "wich", "from": "form", "have": "ahve", "that": "taht",
    "would": "woudl", "about": "abuot", "people": "poeple",
    "separate": "seperate", "definitely": "definately",
}


def _words(text):
    return text.split(" ")


def _en_delete_word(text, rng):
    ws = _words(text)
    if len(ws) <= 1:
        return text
    drop = _pick(rng, len(ws))
    kept = [w for i, w in enumerate(ws) if i not in drop]
    return " ".join(kept) if kept else ws[0]


def _en_swap_word(text, rng):
    ws = _words(text)
    if len(ws) <= 1:
        return text
    for i in sorted(_pick(rng, len(ws) - 1)):
        ws[i], ws[i + 1] = ws[i + 1], ws[i]
    return " ".join(ws)


def _en_spelling_word(text, rng):
    ws = _words(text)
    out = []
    for i, w in enumerate(ws):
        lw = w.lower()
        if lw in _SPELLING and rng.rand() < 0.8:
            rep = _SPELLING[lw]
            out.append(rep.capitalize() if w[:1].isupper() else rep)
        elif len(w) > 3 and rng.rand() < AUG_P:
            # generic slip: swap two interior letters
            j = rng.randint(1, len(w) - 2)
            out.append(w[:j] + w[j + 1] + w[j] + w[j + 2:])
        else:
            out.append(w)
    return " ".join(out)


def _en_split_word(text, rng):
    ws = _words(text)
    out = []
    picked = _pick(rng, len(ws))  # one draw, like the sibling methods
    for i, w in enumerate(ws):
        if len(w) >= 4 and i in picked:
            j = rng.randint(1, len(w) - 1)
            out.append(w[:j] + " " + w[j:])
        else:
            out.append(w)
    return " ".join(out)


def _char_positions(text, rng):
    idx = [i for i, c in enumerate(text) if not c.isspace()]
    if not idx:
        return set()
    take = _pick(rng, len(idx), p=0.1)
    return {idx[i] for i in take}


def _en_keyboard_char(text, rng):
    out = list(text)
    for i in _char_positions(text, rng):
        c = out[i].lower()
        if c in _KEYBOARD:
            rep = _KEYBOARD[c][rng.randint(len(_KEYBOARD[c]))]
            out[i] = rep.upper() if text[i].isupper() else rep
    return "".join(out)


def _en_ocr_char(text, rng):
    out = list(text)
    for i in _char_positions(text, rng):
        if out[i] in _OCR:
            out[i] = _OCR[out[i]]
    return "".join(out)


def _delete_char(text, rng):
    pos = _char_positions(text, rng)
    out = "".join(c for i, c in enumerate(text) if i not in pos)
    return out if out else text


def _swap_char(text, rng):
    out = list(text)
    for i in _char_positions(text, rng):
        if i + 1 < len(out):
            out[i], out[i + 1] = out[i + 1], out[i]
    return "".join(out)


def _en_insert_char(text, rng):
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789!@#$%^&*"
    out = []
    pos = _char_positions(text, rng)
    for i, c in enumerate(text):
        if i in pos:
            out.append(alphabet[rng.randint(len(alphabet))])
        out.append(c)
    return "".join(out)


EN_METHODS = {
    "delete_random_word": _en_delete_word,
    "swap_random_word": _en_swap_word,
    "spelling_error_word": _en_spelling_word,
    "split_random_word": _en_split_word,
    "keyboard_error_char": _en_keyboard_char,
    "ocr_error_char": _en_ocr_char,
    "delete_random_char": _delete_char,
    "swap_random_char": _swap_char,
    "insert_random_char": _en_insert_char,
}

# -- Chinese methods (nlpcda_zh_mapper.py method set) ---------------------

_ZH_SIMILAR = {
    "这里": "这边", "那里": "那边", "我们": "咱们", "非常": "十分",
    "可以": "能够", "知道": "晓得", "现在": "如今", "所有": "全部",
    "立刻": "马上", "美丽": "漂亮", "高兴": "开心", "迅速": "快速",
}
_ZH_HOMOPHONE = {
    "在": "再", "再": "在", "做": "作", "作": "做", "像": "象",
    "象": "像", "带": "戴", "戴": "带", "以": "已", "已": "以",
    "他": "她", "她": "他", "园": "圆", "圆": "园",
}
_ZH_NUM = {"0": "零", "1": "一", "2": "二", "3": "三", "4": "四",
           "5": "五", "6": "六", "7": "七", "8": "八", "9": "九"}


def _zh_similar_word(text, rng):
    keys = [k for k in _ZH_SIMILAR if k in text]
    if not keys:
        return text
    k = keys[rng.randint(len(keys))]
    return text.replace(k, _ZH_SIMILAR[k], 1)


def _zh_homophone_char(text, rng):
    idx = [i for i, c in enumerate(text) if c in _ZH_HOMOPHONE]
    if not idx:
        return text
    out = list(text)
    for i in {idx[j] for j in _pick(rng, len(idx), p=0.5)}:
        out[i] = _ZH_HOMOPHONE[out[i]]
    return "".join(out)


def _zh_equivalent_num(text, rng):
    idx = [i for i, c in enumerate(text) if c in _ZH_NUM]
    if not idx:
        return text
    out = list(text)
    for i in {idx[j] for j in _pick(rng, len(idx), p=1.0)}:
        out[i] = _ZH_NUM[out[i]]
    return "".join(out)


ZH_METHODS = {
    "replace_similar_word": _zh_similar_word,
    "replace_homophone_char": _zh_homophone_char,
    "delete_random_char": _delete_char,
    "swap_random_char": _swap_char,
    "replace_equivalent_num": _zh_equivalent_num,
}


class _AugmentMapper(Mapper):
    """Shared 1→N augmentation engine; subclasses provide the method
    table (reference contract: process_batched in nlpaug_en_mapper.py:
    141-170 — original kept first, then per-method aug_num variants, or
    aug_num sequential compositions)."""

    METHODS: dict = {}

    def __init__(self, sequential: bool = False, aug_num: int = 1,
                 keep_original_sample: bool = True, **kw):
        flags = {m: kw.pop(m, False) for m in self.METHODS}
        super().__init__(**kw)
        if aug_num < 1:
            raise ValueError("aug_num must be >= 1")
        self.sequential = sequential
        self.aug_num = aug_num
        self.keep_original_sample = keep_original_sample
        self.enabled = [m for m, on in flags.items() if on]

    def apply(self, df: DataFrame) -> DataFrame:
        if not self.enabled:
            # reference contract: nothing enabled -> original rows only
            # (or nothing at all when keep_original_sample=False)
            return df if self.keep_original_sample else df.limit(0)

        methods = [(m, self.METHODS[m]) for m in self.enabled]
        aug_num, sequential = self.aug_num, self.sequential
        keep = self.keep_original_sample

        @pandas_udf(ArrayType(StringType()))
        def variants(s: pd.Series) -> pd.Series:
            def one(text):
                if text is None:
                    # null rows pass through untouched (engine-wide
                    # null contract) instead of vanishing in the
                    # explode; nothing to augment, so keep=False drops
                    return [None] if keep else []
                out = [text] if keep else []
                if sequential:
                    for k in range(aug_num):
                        t = text
                        for name, fn in methods:
                            t = fn(t, _rng(text, name, k))
                        out.append(t)
                else:
                    for name, fn in methods:
                        for k in range(aug_num):
                            out.append(fn(text, _rng(text, name, k)))
                return out

            return s.map(one)

        others = [c for c in df.columns if c != self.text_key]
        return df.select(
            *others,
            F.posexplode(variants(F.col(self.text_key)))
            .alias("aug_id", self.text_key),
        ).drop("aug_id")


@OPERATORS.register("nlpaug_en_mapper")
class NlpaugEnMapper(_AugmentMapper):
    """English augmentation (nlpaug_en_mapper.py:19-170): 9 methods,
    word- and char-level."""

    METHODS = EN_METHODS


@OPERATORS.register("nlpcda_zh_mapper")
class NlpcdaZhMapper(_AugmentMapper):
    """Chinese augmentation (nlpcda_zh_mapper.py:17-120): 5 methods,
    compact in-repo similar-word/homophone tables."""

    METHODS = ZH_METHODS
