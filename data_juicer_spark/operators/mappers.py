"""Mapper operators (text-cleaning / rewriting) — Catalyst expression
chains where the semantics are regular, pandas UDFs only for span logic
regex can't express (clean_copyright's block scanning).

Reference cites are into /root/reference/data_juicer/ops/mapper/.
"""

from __future__ import annotations

import re
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from data_juicer_spark.functions import text as T
from data_juicer_spark.operators.base import Mapper
from data_juicer_spark.registry import OPERATORS


def _safe_map(series: pd.Series, fn):
    """Per-sample fault isolation for python-UDF mappers — the
    reference's skip_op_error wrappers (base_op.py:52-133) drop a sample
    whose op raised; in a CDC pipeline a silent drop becomes a lake
    DELETE, so this engine's deviation is keep-the-row-unchanged. One
    pathological row must never fail the whole task at 100 TB. Failures
    are not invisible: the first error per Arrow batch is logged to the
    executor log with the row count affected (a per-row flag column
    would change every mapper's output schema — deliberate tradeoff)."""

    errors = {"n": 0, "first": None}

    def guarded(v):
        try:
            return fn(v)
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors["n"] += 1
            if errors["first"] is None:
                errors["first"] = repr(exc)
            return v

    out = series.map(guarded)
    if errors["n"]:
        import logging

        logging.getLogger("data_juicer_spark.safe_map").warning(
            "mapper left %d/%d rows unchanged after per-row errors "
            "(first: %s)", errors["n"], len(series), errors["first"])
    return out


@OPERATORS.register("whitespace_normalization_mapper")
class WhitespaceNormalizationMapper(Mapper):
    """strip + map unicode whitespace variants to 0x20
    (whitespace_normalization_mapper.py:31-39)."""

    def expr(self, col: Column) -> Column:
        cls = T._charclass(T.VARIOUS_WHITESPACES)
        return F.regexp_replace(F.trim(col), f"[{cls}]", " ")


@OPERATORS.register("punctuation_normalization_mapper")
class PunctuationNormalizationMapper(Mapper):
    """unicode punctuation → ASCII (punctuation_normalization_mapper.py:20-68)."""

    UNICODE_PUNCT = {
        "，": ",", "。": ".", "、": ",", "„": '"', "”": '"', "“": '"',
        "«": '"', "»": '"', "１": '"', "」": '"', "「": '"', "《": '"',
        "》": '"', "´": "'", "∶": ":", "：": ":", "？": "?", "！": "!",
        "（": "(", "）": ")", "；": ";", "–": "-", "—": " - ", "．": ". ",
        "～": "~", "’": "'", "…": "...", "━": "-", "〈": "<", "〉": ">",
        "【": "[", "】": "]", "％": "%", "►": "-",
    }

    def expr(self, col: Column) -> Column:
        out = col
        # single-char→single-char pairs via one translate; multi-char via replace
        one_to_one = [(k, v) for k, v in self.UNICODE_PUNCT.items()
                      if len(k) == 1 and len(v) == 1]
        out = F.translate(out, "".join(k for k, _ in one_to_one),
                          "".join(v for _, v in one_to_one))
        for k, v in self.UNICODE_PUNCT.items():
            if len(k) != 1 or len(v) != 1:
                out = F.replace(out, F.lit(k), F.lit(v))
        return out


@OPERATORS.register("clean_email_mapper")
class CleanEmailMapper(Mapper):
    """regex-remove emails (clean_email_mapper.py:21-47)."""

    DEFAULT_PAT = r"[A-Za-z0-9.\-+_]+@[a-z0-9.\-+_]+\.[a-z]+"

    def __init__(self, pattern: str | None = None, repl: str = "", **kw):
        super().__init__(**kw)
        self.pattern = pattern or self.DEFAULT_PAT
        self.repl = repl

    def expr(self, col: Column) -> Column:
        return F.regexp_replace(col, self.pattern, self.repl)


@OPERATORS.register("clean_ip_mapper")
class CleanIpMapper(Mapper):
    """regex-remove IPv4/IPv6 (clean_ip_mapper.py:27-56)."""

    DEFAULT_PAT = (
        r"(?:(?:1[0-9][0-9]\.)|(?:2[0-4][0-9]\.)|(?:25[0-5]\.)|(?:[1-9][0-9]\.)|(?:[0-9]\.))"
        r"{3}(?:(?:1[0-9][0-9])|(?:2[0-4][0-9])|(?:25[0-5])|(?:[1-9][0-9])|(?:[0-9]))"
        r"|([\da-fA-F]{1,4}:){7}[\da-fA-F]{1,4}"
    )

    def __init__(self, pattern: str | None = None, repl: str = "", **kw):
        super().__init__(**kw)
        self.pattern = pattern or self.DEFAULT_PAT
        self.repl = repl

    def expr(self, col: Column) -> Column:
        return F.regexp_replace(col, self.pattern, self.repl)


@OPERATORS.register("clean_links_mapper")
class CleanLinksMapper(Mapper):
    """regex-remove links (clean_links_mapper.py:24-59) — the reference's
    exact default pattern (Gruber-style: any scheme `x://`, www., or
    bare domain/path), ported character-for-character."""

    # (?U) = Java UNICODE_CHARACTER_CLASS so \w matches like Python's
    # unicode-default \w (the reference matches 'http测试://' schemes)
    DEFAULT_PAT = (
        r"(?iU)\b("
        r"(?:[a-z][\w-]+:(?:\/{1,3}|"
        r"[a-z0-9%])|www\d{0,3}[.]|"
        r"[a-z0-9.\-]+[.][a-z]{2,4}\/)"
        r"(?:[^\s()<>]+|\(([^\s()<>]+|"
        r"(\([^\s()<>]+\)))*\))"
        r"+(?:\(([^\s()<>]+|(\([^\s()<>]+\)))*\)|"
        r"[^\s`!()\[\]{};:\'\".,<>?«»“”‘’])"
        r")"
    )

    def __init__(self, pattern: str | None = None, repl: str = "", **kw):
        super().__init__(**kw)
        self.pattern = pattern or self.DEFAULT_PAT
        self.repl = repl

    def expr(self, col: Column) -> Column:
        return F.regexp_replace(col, self.pattern, self.repl)


@OPERATORS.register("replace_content_mapper")
class ReplaceContentMapper(Mapper):
    """generic pattern→repl chain (replace_content_mapper.py:23-69)."""

    def __init__(self, pattern=None, repl="", **kw):
        super().__init__(**kw)
        pats = pattern if isinstance(pattern, list) else [pattern]
        repls = repl if isinstance(repl, list) else [repl] * len(pats)
        self.pairs = [(p, r) for p, r in zip(pats, repls) if p]

    def expr(self, col: Column) -> Column:
        out = col
        for p, r in self.pairs:
            out = F.regexp_replace(out, p, r)
        return out


@OPERATORS.register("remove_specific_chars_mapper")
class RemoveSpecificCharsMapper(Mapper):
    """delete a given char set (remove_specific_chars_mapper.py:20-43)."""

    def __init__(self, chars_to_remove: str = "◆●■►▼▲▴∆▻▷❖♡□", **kw):
        super().__init__(**kw)
        self.chars = chars_to_remove

    def expr(self, col: Column) -> Column:
        cls = T._charclass(set(self.chars))
        return F.regexp_replace(col, f"[{cls}]", "")


@OPERATORS.register("remove_long_words_mapper")
class RemoveLongWordsMapper(Mapper):
    """drop words with len outside [min,max]
    (remove_long_words_mapper.py:45-51 should_keep_long_word): a word is
    kept when ITS length fits OR its length fits after stripping
    SPECIAL_CHARACTERS from both ends (emoji-suffixed words survive).
    Higher-order array functions, no Python."""

    def __init__(self, min_len: int = 1, max_len: int = 128, **kw):
        super().__init__(**kw)
        self.min_len, self.max_len = min_len, max_len

    def expr(self, col: Column) -> Column:
        lo, hi = self.min_len, self.max_len
        # the reference strips SPECIAL_CHARACTERS which include the emoji
        # package's full list; hermetically we add the emoji BLOCKS to
        # the edge-strip class (covers the practical set)
        cls = T._charclass(T.SPECIAL_CHARACTERS) + (
            r"\x{FE0F}\x{2600}-\x{27BF}\x{1F000}-\x{1FAFF}\x{1F1E6}-\x{1F1FF}")
        edge = f"^[{cls}]+|[{cls}]+$"

        def keep(w):
            stripped = F.regexp_replace(w, edge, "")
            return ((F.length(w) >= lo) & (F.length(w) <= hi)) | \
                   ((F.length(stripped) >= lo) & (F.length(stripped) <= hi))

        return F.array_join(F.filter(F.split(col, " "), keep), " ")


@OPERATORS.register("remove_table_text_mapper")
class RemoveTableTextMapper(Mapper):
    """regex-remove ASCII tables with 2..20 columns
    (remove_table_text_mapper.py:20-48)."""

    def __init__(self, min_col: int = 2, max_col: int = 20, **kw):
        super().__init__(**kw)
        self.min_col, self.max_col = min_col, max_col

    def expr(self, col: Column) -> Column:
        # capture-and-keep the preceding \n instead of a lookbehind: same
        # semantics (a table body must follow a newline) but expressible
        # in lookbehind-free regex engines too, so the DuckDB oracle can
        # mirror the exact pattern
        out = col
        for n in range(self.min_col, self.max_col + 1):
            pat = r"(\n)((\S+?)([ |\t]+(\S+?)){%d}\n+){2,}" % (n - 1)
            out = F.regexp_replace(out, pat, "$1")
        return out


@OPERATORS.register("remove_comments_mapper")
class RemoveCommentsMapper(Mapper):
    """remove '%' TeX comments (remove_comments_mapper.py:31-61)."""

    def __init__(self, doc_type: str = "tex", inline: bool = True, multiline: bool = True, **kw):
        super().__init__(**kw)
        self.inline, self.multiline = inline, multiline

    def expr(self, col: Column) -> Column:
        # reference order: inline first, then multiline; both patterns run
        # with MULTILINE so '$'/'^' anchor per line (remove_comments_mapper
        # .py:54-57 applies re.MULTILINE to both)
        out = col
        if self.inline:
            out = F.regexp_replace(out, r"(?m)[^\\]%.+$", "")
        if self.multiline:
            out = F.regexp_replace(out, r"(?m)^%.*\n?", "")
        return out


@OPERATORS.register("remove_bibliography_mapper")
class RemoveBibliographyMapper(Mapper):
    """drop LaTeX bibliography tail (remove_bibliography_mapper.py:21-41)."""

    def expr(self, col: Column) -> Column:
        pat = r"(?s)(\\appendix|\\begin\{references\}|\\begin\{REFERENCES\}|\\begin\{thebibliography\}|\\bibliography\{.*\}).*$"
        return F.regexp_replace(col, pat, "")


@OPERATORS.register("remove_header_mapper")
class RemoveHeaderMapper(Mapper):
    r"""drop content before the first LaTeX sectioning command — the
    reference's EXACT pattern ported verbatim (remove_header_mapper.py:
    32-40), including its two upstream quirks reproduced faithfully:
    (a) the missing `|` between the paragraph and subparagraph
    alternatives (so that branch only matches a \paragraph{..}
    IMMEDIATELY followed by \subparagraph{..}), and (b) `drop_no_head`
    being observably a no-op — the reference assigns text = "" to a
    LOCAL and `continue`s without writing back (:44-48), so headerless
    samples pass through unchanged regardless of the flag."""

    _PAT = (
        r"(?s)^(.*?)("
        r"\\\bchapter\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
        r"\\\bpart\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
        r"\\\bsection\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
        r"\\\bsubsection\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
        r"\\\bsubsubsection\b\*?(?:\[(.*?)\])?\{(.*?)\}|"
        r"\\\bparagraph\b\*?(?:\[(.*?)\])?\{(.*?)\}"
        r"\\\bsubparagraph\b\*?(?:\[(.*?)\])?\{(.*?)\}"
        r")"
    )

    def __init__(self, drop_no_head: bool = True, **kw):
        super().__init__(**kw)
        self.drop_no_head = drop_no_head  # reference dead-write: no-op

    def expr(self, col: Column) -> Column:
        return F.regexp_replace(col, self._PAT, "$2")


@OPERATORS.register("clean_copyright_mapper")
class CleanCopyrightMapper(Mapper):
    """RedPajama code cleaning, reference-exact
    (clean_copyright_mapper.py:33-59): if the text contains a /*...*/
    block, strip it ONLY when it mentions copyright and return (no line
    logic); otherwise greedily strip LEADING lines that start with
    //, #, -- or are empty — unconditionally (most such headers are
    copyright banners). Span logic needs a pandas UDF."""

    _BLOCK_RE = re.compile(r"/\*[^*]*\*+(?:[^/*][^*]*\*+)*/", re.DOTALL)

    def apply(self, df: DataFrame) -> DataFrame:
        block_re = self._BLOCK_RE

        @pandas_udf(StringType())
        def clean(s: pd.Series) -> pd.Series:
            def one(txt):
                if txt is None:
                    return txt
                m = block_re.search(txt)
                if m:
                    if "copyright" in m.group(0).lower():
                        txt = txt[: m.start()] + txt[m.end():]
                    return txt
                lines = txt.split("\n")
                skip = 0
                for line in lines:
                    if (line.startswith("//") or line.startswith("#")
                            or line.startswith("--") or not line):
                        skip += 1
                    else:
                        break
                if skip:
                    txt = "\n".join(lines[skip:])
                return txt

            # vectorized prefilter: only rows that could change run the
            # python span logic (a block candidate, or a leading comment
            # marker / empty first line)
            mask = (s.str.contains("/*", regex=False, na=False)
                    | s.str.match(r"(//|#|--|\n)", na=False)
                    | (s.fillna("x").str.len().eq(0)))
            if not mask.any():
                return s
            out = s.copy()
            out[mask] = _safe_map(s[mask], one)
            return out

        return df.withColumn(self.text_key, clean(F.col(self.text_key)))


@OPERATORS.register("clean_html_mapper")
class CleanHtmlMapper(Mapper):
    """HTML → plain text (clean_html_mapper.py:26-44): <li>/<ol> become
    newline bullets, </li>/</ol> drop, then tags strip and the common
    entities decode. The reference parses with selectolax (unavailable
    hermetically); this regex chain covers its common-case behavior —
    documented deviation: no DOM repair of malformed markup."""

    ENTITIES = [
        ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&#39;", "'"), ("&copy;", "©"), ("&reg;", "®"), ("&trade;", "™"),
        ("&hellip;", "…"), ("&mdash;", "—"), ("&ndash;", "–"),
        ("&amp;", "&"),
    ]

    def expr(self, col: Column) -> Column:
        out = col
        for src, dst in (("<li>", "\n*"), ("</li>", ""),
                         ("<ol>", "\n*"), ("</ol>", "")):
            out = F.replace(out, F.lit(src), F.lit(dst))
        # selectolax tag rules: an opening tag must start with an ASCII
        # letter (or ! for doctype/comments); any '</...>' closes. Bare
        # '<非标签>' text survives, like the parser. Whitespace BEFORE the
        # first node is dropped by tree construction (leading strip);
        # trailing in-body whitespace is kept.
        out = F.regexp_replace(out, r"(?s)</[^>]*>|<[a-zA-Z!][^>]*>", "")
        for src, dst in self.ENTITIES:
            out = F.replace(out, F.lit(src), F.lit(dst))
        return F.regexp_replace(out, r"^\s+", "")


@OPERATORS.register("fix_unicode_mapper")
class FixUnicodeMapper(Mapper):
    """unicode repair (fix_unicode_mapper.py:22-49 uses ftfy): NFC/NFKC/
    NFD/NFKD normalization via unicodedata, plus ftfy's core mojibake
    heuristic (``fix_mojibake=True``): text that was UTF-8 decoded as
    latin-1/cp1252 ("Ã©", "â€™", …) is re-encoded and re-decoded, up to
    twice for double-mojibake, keeping the original whenever the
    roundtrip fails or produces replacement chars. Hermetic deviation:
    ftfy's full heuristic set (HTML entities, curly-quote repair, …) is
    not replicated."""

    # UTF-8 lead bytes (0xC2/0xC3/0xE2) mis-decoded as latin-1/cp1252
    # appear as these marker chars followed by a high-latin or cp1252
    # punctuation char
    _MOJIBAKE_HINT = re.compile(
        "[\u00c2\u00c3\u00e2][\u00a0-\u00ff\u20ac\u201a\u0192"
        "\u201e\u2026\u2020\u2021\u02c6\u2030\u0160\u2039\u0152"
        "\u017d\u2018\u2019\u201c\u201d\u2022\u2013\u2014\u02dc"
        "\u2122\u0161\u203a\u0153\u017e\u0178]"
    )

    def __init__(self, normalization: str = "NFC",
                 fix_mojibake: bool = True, **kw):
        super().__init__(**kw)
        form = normalization.upper()
        if form not in ("NFC", "NFKC", "NFD", "NFKD"):
            raise ValueError(f"bad normalization {form}")
        self.form = form
        self.fix_mojibake = fix_mojibake

    def apply(self, df: DataFrame) -> DataFrame:
        form = self.form
        do_moji = self.fix_mojibake
        hint = self._MOJIBAKE_HINT

        @pandas_udf(StringType())
        def fix(s: pd.Series) -> pd.Series:
            import unicodedata

            def demojibake(t):
                for codec in ("cp1252", "latin-1"):
                    try:
                        repaired = t.encode(codec).decode("utf-8")
                    except (UnicodeEncodeError, UnicodeDecodeError):
                        continue
                    if "�" not in repaired:
                        return repaired
                return t

            def one(t):
                if t is None:
                    return t
                if do_moji:
                    # iterate to fixpoint — real-world text is double- or
                    # even triple-mojibake (ftfy does the same)
                    for _ in range(4):
                        if not hint.search(t):
                            break
                        repaired = demojibake(t)
                        if repaired == t:
                            break
                        t = repaired
                    # ftfy defaults also uncurl quotes and fix line breaks
                    t = (t.replace("‘", "'").replace("’", "'")
                          .replace("“", '"').replace("”", '"')
                          .replace("\r\n", "\n").replace("\r", "\n"))
                return unicodedata.normalize(form, t)

            return _safe_map(s, one)

        return df.withColumn(self.text_key, fix(F.col(self.text_key)))


def _split_sentence_ref(text):
    """Reference sentence splitter (remove_repeat_sentences_mapper.py:6-11):
    four sequential subs insert a newline after sentence-final punctuation
    (quote-aware), then split — ported character-for-character."""
    text = re.sub("([.\u3002\uff01!\uff1f\\?])([^\u2019\u201d])", r"\1\n\2", text)
    text = re.sub("(\\.{6})([^\u2019\u201d])", r"\1\n\2", text)
    text = re.sub("(\\\u2026{2})([^\u2019\u201d])", r"\1\n\2", text)
    text = re.sub("([.\u3002!\uff01\uff1f\\?\\.{6}\\\u2026{2}][\u2019\u201d])([^\u2019\u201d])",
                  r"\1\n\2", text)
    return text.split("\n")


@OPERATORS.register("remove_repeat_sentences_mapper")
class RemoveRepeatSentencesMapper(Mapper):
    """dedupe repeated sentences within a doc — reference-exact
    (remove_repeat_sentences_mapper.py:57-82): per line, reference
    sentence split; dedup key = sentence.strip() [optionally lowercased]
    with non-alnum/CJK chars removed when ignore_special_character;
    sentences shorter than the min length are always kept (and NOT
    remembered); kept sentences CONCATENATED with no separator (the
    split preserves inner spacing); lines re-joined with newline."""

    def __init__(self, lowercase: bool = False, ignore_special_character: bool = True,
                 min_repeat_sentence_length: int = 2, **kw):
        super().__init__(**kw)
        self.lowercase = lowercase
        self.ignore_special = ignore_special_character
        self.min_len = min_repeat_sentence_length

    def apply(self, df: DataFrame) -> DataFrame:
        lower, ignore, min_len = self.lowercase, self.ignore_special, self.min_len
        remove_re = re.compile(
            "[^a-zA-Z0-9\u4e00-\u9fa5\n\t ]") if ignore else None

        @pandas_udf(StringType())
        def dedup_sents(s: pd.Series) -> pd.Series:
            def one(txt):
                if txt is None:
                    return txt
                new_lines, seen = [], set()
                for line in txt.split("\n"):
                    new_sent = ""
                    if line:
                        for sentence in _split_sentence_ref(line):
                            copy = sentence.strip()
                            if lower:
                                copy = copy.lower()
                            if remove_re is not None:
                                copy = remove_re.sub("", copy)
                            if len(copy) < min_len:
                                new_sent += sentence
                            elif copy not in seen:
                                new_sent += sentence
                                seen.add(copy)
                    new_lines.append(new_sent)
                return "\n".join(new_lines)

            return _safe_map(s, one)

        return df.withColumn(self.text_key, dedup_sents(F.col(self.text_key)))


@OPERATORS.register("remove_words_with_incorrect_substrings_mapper")
class RemoveWordsWithIncorrectSubstringsMapper(Mapper):
    """drop words containing any bad substring
    (remove_words_with_incorrect_substrings_mapper.py:38-93)."""

    def __init__(self, substrings=None, lang: str = "en",
                 tokenization: bool = False, **kw):
        super().__init__(**kw)
        if tokenization:
            raise NotImplementedError(
                "tokenization=True needs the reference's sentencepiece "
                "model (a serving dep) — hermetic build supports "
                "whitespace words only")
        self.substrings = substrings or ["http", "www", ".com", "href", "//"]

    def expr(self, col: Column) -> Column:
        subs = self.substrings

        def bad(w):
            c = F.lit(False)
            for s in subs:
                c = c | F.contains(w, F.lit(s))
            return ~c
        return F.array_join(F.filter(F.split(col, " "), bad), " ")


@OPERATORS.register("sentence_split_mapper")
class SentenceSplitMapper(Mapper):
    """split into sentences, rejoin with \\n (sentence_split_mapper.py:22-47;
    regex splitter instead of NLTK — hermetic). Dotted acronyms
    (U.S., E.U., …) are protected punkt-style: a letter-dot-letter-dot
    run is never a sentence boundary (reference golden
    test_sentence_split_mapper.py:18-32). Uses \\x02 as an internal
    sentinel: a literal U+0002 in the input would be restored as '.'
    (control chars are stripped upstream by the cleaning mappers)."""

    def __init__(self, lang: str = "en", **kw):
        super().__init__(**kw)
        # selects the NLTK punkt model in the reference
        # (sentence_split_mapper.py:22-34); the hermetic regex splitter
        # is language-independent and reproduces the punkt behaviors the
        # reference's own en/fr/pt/es unit fixtures exercise (ported in
        # tests/test_chunk_replace_goldens.py)
        self.lang = lang

    def expr(self, col: Column) -> Column:
        protected = F.regexp_replace(
            col, r"([A-Z])\.([A-Z])\.", "$1\x02$2\x02")
        # second pass catches the odd trailing initial the
        # non-overlapping first pass leaves behind (U.S.A. → …\x02A.)
        protected = F.regexp_replace(
            protected, "(\x02)([A-Z])\\.", "$1$2\x02")
        split = F.regexp_replace(protected, r"(?<=[.!?。！？])\s+", "\n")
        return F.translate(split, "\x02", ".")


@OPERATORS.register("text_chunk_mapper")
class TextChunkMapper(Mapper):
    """split doc into chunks, 1→N rows — full reference semantics
    (text_chunk_mapper.py:35-146): split_pattern only → re.split with
    separators kept then blanks dropped; max_len only → fixed windows
    of max_len stepping (max_len - overlap_len); both → recursive cut
    at the LAST pattern match inside each max_len prefix, overlap-step
    fallback when no match. HF/tiktoken tokenizers are a model dep —
    length = characters (documented deviation).

    The fixed-window mode stays pure Catalyst (posexplode over a
    substring transform); pattern modes run re inside an Arrow-batched
    UDF producing the chunk array, then the same posexplode."""

    def __init__(self, max_len: Optional[int] = None,
                 split_pattern: Optional[str] = r"\n\n",
                 overlap_len: int = 0, tokenizer: Optional[str] = None,
                 trust_remote_code: bool = False, **kw):
        if tokenizer is not None:
            raise NotImplementedError(
                "text_chunk_mapper tokenizer mode needs the HF tokenizer "
                "(model dep, not in the hermetic build); max_len applies "
                "to characters, the reference's tokenizer=None path")
        super().__init__(**kw)
        if max_len is None and split_pattern is None:
            raise ValueError("max_len and split_pattern cannot be both None")
        if max_len is not None and overlap_len >= max_len:
            raise ValueError("overlap_len must be less than max_len")
        self.max_len = max_len
        self.overlap = overlap_len
        self.split_pattern = split_pattern
        if split_pattern is not None:
            re.compile(split_pattern)  # fail at construction, not on tasks

    def _chunks_catalyst(self):
        # reference fixed-window count: 1 chunk when len <= max_len,
        # else ceil(len / step) windows of max_len each (the final
        # window may be shorter; a redundant tail window appears when
        # step divides len — reference-faithful)
        step = self.max_len - self.overlap
        length = F.length(F.col(self.text_key))
        n_chunks = (
            F.when(length <= F.lit(self.max_len), F.lit(1))
            .otherwise(F.ceil(length / F.lit(step)))
        ).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.substring(
                F.col(self.text_key), (i * step + 1).cast("int"), self.max_len
            ),
        )

    def _chunks_udf(self):
        pat, max_len, overlap = self.split_pattern, self.max_len, self.overlap

        @pandas_udf(ArrayType(StringType()))
        def chunk(s: pd.Series) -> pd.Series:
            reg = re.compile(pat)

            def one(text):
                if text is None:
                    return [None]  # null passthrough (engine contract)
                if max_len is None:
                    parts = re.split(f"({pat})", text)
                    return [t for t in parts if t.strip()]
                # both set: recursive last-match cut (iterative form)
                out = []
                t = text
                while len(t) > max_len:
                    sub = t[:max_len]
                    ms = list(reg.finditer(sub))
                    if not ms:
                        out.append(sub)
                        t = t[max_len - overlap:]
                    else:
                        last = ms[-1]
                        out.append(sub[:last.start()])
                        nxt = t[last.end():]
                        if len(nxt) >= len(t):  # zero-width safety
                            out.append(t)
                            return out
                        t = nxt
                out.append(t)
                return out

            return s.map(one)

        return chunk(F.col(self.text_key))

    def apply(self, df: DataFrame) -> DataFrame:
        chunks = (self._chunks_catalyst() if self.split_pattern is None
                  else self._chunks_udf())
        # posexplode drops null/empty arrays — null text must pass
        # through as one null chunk (engine null contract)
        chunks = F.when(F.col(self.text_key).isNull(),
                        F.array(F.lit(None).cast("string"))).otherwise(chunks)
        others = [c for c in df.columns if c != self.text_key]
        return (
            df.select(*others, F.posexplode(chunks).alias("chunk_id", self.text_key))
        )


@OPERATORS.register("expand_macro_mapper")
class ExpandMacroMapper(Mapper):
    """inline-expand non-arg LaTeX \\newcommand/\\def macros — reference-
    parity patterns (expand_macro_mapper.py:31-91): definitions anchored
    at line end, names [a-zA-Z0-9]+ only, each expansion keeps the
    non-alnum character following the macro, and the definition line
    itself is rewritten too (reference subs everywhere)."""

    _NC_RE = re.compile(r"\\\bnewcommand\b\*?\{(\\[a-zA-Z0-9]+?)\}\{(.*?)\}$",
                        re.MULTILINE)
    _DEF_RE = re.compile(r"\\def\s*(\\[a-zA-Z0-9]+?)\s*\{(.*?)\}$", re.MULTILINE)

    def apply(self, df: DataFrame) -> DataFrame:
        nc_re, def_re = self._NC_RE, self._DEF_RE

        @pandas_udf(StringType())
        def expand(s: pd.Series) -> pd.Series:
            def one(txt):
                if txt is None:
                    return txt
                macros = {}
                for reg in (nc_re, def_re):
                    for m in reg.finditer(txt):
                        name = m.group(1).encode("unicode-escape").decode("utf-8")
                        macros[name] = m.group(2)
                for name, val in macros.items():
                    # function replacement (not a template): identical to
                    # the reference's escaped-template semantics for the
                    # backslash case, and immune to re's 'bad escape \\x'
                    # on non-ASCII macro bodies (the reference's template
                    # path crashes there)
                    txt = re.sub(
                        r"(" + name + r")([^a-zA-Z0-9])",
                        lambda m, v=val: v + m.group(2), txt)
                return txt

            return _safe_map(s, one)

        return df.withColumn(self.text_key, expand(F.col(self.text_key)))


@OPERATORS.register("remove_non_chinese_character_mapper")
class RemoveNonChineseCharacterMapper(Mapper):
    """keep CJK (± alpha/number/punct)
    (remove_non_chinese_character_mapper.py:21-47)."""

    def __init__(self, keep_alphabet: bool = True, keep_number: bool = True,
                 keep_punc: bool = True, **kw):
        super().__init__(**kw)
        # exact reference pattern construction
        # (remove_non_chinese_character_mapper.py:33-41)
        pat = "[^一-龥"
        if keep_alphabet:
            pat += "A-Za-z"
        if keep_number:
            pat += "0-9"
        if keep_punc:
            pat += ".， ,\\-。%《*》/•、&＆(—)（+）：？!！“”·]+"
        else:
            pat += "]"
        self.pattern = pat

    def expr(self, col: Column) -> Column:
        return F.regexp_replace(col, self.pattern, "")


@OPERATORS.register("chinese_convert_mapper")
class ChineseConvertMapper(Mapper):
    """simplified↔traditional↔regional↔Japanese conversion
    (chinese_convert_mapper.py:39-109 wraps opencc; all 14 of its
    configs supported). Hermetic implementation over compact in-repo
    tables (assets/zh_convert.py): each mode composes phrase replaces
    (longest-first) and one-to-one character translate()s — ALL JVM
    expressions inside whole-stage codegen, no Python. Tables are much
    smaller than opencc's dictionaries (documented deviation); unmapped
    characters pass through. Pipelines mirror opencc's composition:
    s2tw = STPhrases→STCharacters→TWVariants, etc."""

    MODES = ("s2t", "t2s", "s2tw", "tw2s", "s2hk", "hk2s", "s2twp",
             "tw2sp", "t2tw", "tw2t", "t2hk", "hk2t", "t2jp", "jp2t")

    def __init__(self, mode: str = "s2t", **kw):
        super().__init__(**kw)
        from data_juicer_spark.assets import zh_convert as Z

        if mode not in self.MODES:
            raise ValueError(
                f"unsupported mode {mode!r} (one of {'|'.join(self.MODES)})")
        self.mode = mode
        inv = lambda d: {v: k for k, v in d.items()}  # noqa: E731
        # each step: ("phrase", dict) or ("char", dict), applied in order
        st_p, twp = Z.ST_PHRASES, Z.TWP_PHRASES
        tw, hk = Z.TW_VARIANTS, Z.HK_VARIANTS
        self.steps = {
            "s2t": [("phrase", st_p), ("char", Z.S2T)],
            "t2s": [("phrase", inv(st_p)), ("char", Z.T2S)],
            "s2tw": [("phrase", st_p), ("char", Z.S2T), ("char", tw)],
            "tw2s": [("char", inv(tw)), ("phrase", inv(st_p)),
                     ("char", Z.T2S)],
            "s2twp": [("phrase", twp), ("phrase", st_p), ("char", Z.S2T),
                      ("char", tw)],
            "tw2sp": [("phrase", inv(twp)), ("char", inv(tw)),
                      ("phrase", inv(st_p)), ("char", Z.T2S)],
            "s2hk": [("phrase", st_p), ("char", Z.S2T), ("char", hk)],
            "hk2s": [("char", inv(hk)), ("phrase", inv(st_p)),
                     ("char", Z.T2S)],
            "t2tw": [("char", tw)],
            "tw2t": [("char", inv(tw))],
            "t2hk": [("char", hk)],
            "hk2t": [("char", inv(hk))],
            "t2jp": [("char", Z.T2JP)],
            "jp2t": [("char", Z.JP2T)],
        }[mode]

    def expr(self, col: Column) -> Column:
        out = col
        for kind, table in self.steps:
            if kind == "phrase":
                for k in sorted(table, key=len, reverse=True):
                    out = F.replace(out, F.lit(k), F.lit(table[k]))
            else:
                out = F.translate(out, "".join(table.keys()),
                                  "".join(table.values()))
        return out


def _apply_dict_transform(df: DataFrame, make_fn, batched: bool,
                          who: str) -> DataFrame:
    """Shared sample-dict → dict transform engine for the python_lambda
    / python_file escape hatches: the user function is rebuilt ON the
    executor by `make_fn` (closing over plain strings, never pickled
    code objects) and applied per Arrow batch. Spark plans have a static
    schema, so the result dict must retain the input columns (documented
    deviation from the reference's dynamic columns)."""
    cols = df.columns

    def run(iterator):
        f = make_fn()

        def check(result):
            if not isinstance(result, dict):
                raise ValueError(
                    f"{who} must return a dictionary, got "
                    f"{type(result).__name__} instead.")
            missing = [c for c in cols if c not in result]
            if missing:
                raise ValueError(
                    f"{who} result dropped column(s) {missing} — Spark "
                    f"plans need a stable schema (engine deviation from "
                    f"the reference's dynamic columns)")
            return result

        for pdf in iterator:
            if batched:
                out = check(f(pdf.to_dict("list")))
                yield pd.DataFrame({c: out[c] for c in cols})
            else:
                rows = [check(f(r)) for r in pdf.to_dict("records")]
                yield pd.DataFrame({c: [r[c] for r in rows] for c in cols})

    return df.mapInPandas(run, schema=df.schema)


@OPERATORS.register("python_file_mapper")
class PythonFileMapper(Mapper):
    """apply a named function from a user .py file to each sample dict
    (python_file_mapper.py:24-91): reference-identical construction
    validation (file exists / .py / function present / callable /
    exactly one argument), dict-result contract, `batched` mode. The
    file's SOURCE is shipped to executors and exec'd there — works under
    spark-submit where the driver-local path doesn't exist on workers."""

    def __init__(self, file_path: str = "",
                 function_name: str = "process_single",
                 batched: bool = False, **kw):
        super().__init__(**kw)
        import inspect
        import os

        self.file_path = file_path
        self.function_name = function_name
        self.batched = batched
        self.source = None
        if not file_path:
            return  # identity, like the reference
        if not os.path.isfile(file_path):
            raise FileNotFoundError(f"The file '{file_path}' does not exist.")
        if not file_path.endswith(".py"):
            raise ValueError(f"The file '{file_path}' is not a Python file.")
        with open(file_path) as fh:
            self.source = fh.read()
        namespace: dict = {}
        exec(compile(self.source, file_path, "exec"), namespace)
        if function_name not in namespace:
            raise ValueError(
                f"Function '{function_name}' not found in '{file_path}'.")
        func = namespace[function_name]
        if not callable(func):
            raise ValueError(
                f"The attribute '{function_name}' is not callable.")
        if len(inspect.getfullargspec(func).args) != 1:
            raise ValueError(
                f"The function '{function_name}' must take exactly one "
                f"argument")

    def apply(self, df: DataFrame) -> DataFrame:
        if self.source is None:
            return df
        source, name, path = self.source, self.function_name, self.file_path

        def make_fn():
            namespace: dict = {}
            exec(compile(source, path, "exec"), namespace)
            return namespace[name]

        return _apply_dict_transform(df, make_fn, self.batched, "Function")


@OPERATORS.register("python_lambda_mapper")
class PythonLambdaMapper(Mapper):
    """user-supplied lambda — the UDF escape hatch
    (python_lambda_mapper.py:19-77). Two modes:

    - reference mode: ``lambda_str`` is a string lambda over the SAMPLE
      DICT (``"lambda d: {'text': d['text'].lower()}"``), AST-validated
      at construction exactly like the reference (must be a lambda,
      exactly one argument; result must be a dict at runtime).
      ``batched=True`` passes the whole Arrow batch as a dict of column
      lists. Deviation: Spark plans have a static schema, so the dict
      must keep the input columns (reference can grow columns per-row).
    - fast mode: ``fn`` is a callable pandas.Series -> pandas.Series
      over ``text_key`` (vectorized, preferred for hot paths).

    Empty lambda_str + no fn = identity, as in the reference."""

    def __init__(self, fn=None, lambda_str: str = "", batched: bool = False,
                 **kw):
        super().__init__(**kw)
        self.fn = fn
        self.batched = batched
        self.lambda_str = lambda_str
        if lambda_str:
            self._validate_lambda(lambda_str)  # construction-time, like ref

    @staticmethod
    def _validate_lambda(lambda_str: str):
        import ast

        try:
            node = ast.parse(lambda_str, mode="eval")
        except SyntaxError as e:
            raise ValueError(f"Invalid lambda function: {e}")
        if not isinstance(node.body, ast.Lambda):
            raise ValueError("Input string must be a valid lambda function.")
        if len(node.body.args.args) != 1:
            raise ValueError("Lambda function must have exactly one argument.")

    def apply(self, df: DataFrame) -> DataFrame:
        if self.fn is not None:
            fn = self.fn
            udf = pandas_udf(StringType())(lambda s: fn(s))
            return df.withColumn(self.text_key, udf(F.col(self.text_key)))
        if not self.lambda_str:
            return df  # identity (reference default)

        lambda_str = self.lambda_str

        def make_fn():
            # recompile on the executor from the validated source — no
            # pickled code objects. builtins is imported LOCALLY: a
            # global `__builtins__` reference would make cloudpickle
            # serialize the whole builtins dict by value, which fails
            # with "cannot pickle 'PyCapsule'" the moment any pybind11
            # library (duckdb, many ML libs) has been imported in the
            # driver — they stash an internals capsule in builtins
            import ast
            import builtins

            return eval(compile(ast.parse(lambda_str, mode="eval"),
                                "<string>", "eval"),
                        {"__builtins__": builtins})

        return _apply_dict_transform(df, make_fn, self.batched,
                                     "Lambda function")

@OPERATORS.register("extract_tables_from_html_mapper")
class ExtractTablesFromHtmlMapper(Mapper):
    """extract <table> content into a typed meta column
    (mapper/extract_tables_from_html_mapper.py:47-88): raw table HTML
    when retain_html_tags, else nested [table][row][cell] text lists
    with the reference's recursive find_all semantics (nested tables
    appear standalone AND inside enclosing tables), direct-child cell
    collection, and header-row skip via include_header. Parsing runs in
    an Arrow-batched pandas UDF (stdlib HTMLParser — bs4 is not in this
    container; semantics reproduced in functions/html_tables.py). A
    sample whose tables column already exists is left untouched, like
    the reference's already-generated check."""

    def __init__(self, tables_field_name: str = "html_tables",
                 retain_html_tags: bool = False,
                 include_header: bool = True, **kw):
        super().__init__(**kw)
        self.tables_field_name = tables_field_name
        self.retain = retain_html_tags
        self.include_header = include_header

    def apply(self, df: DataFrame) -> DataFrame:
        if self.tables_field_name in df.columns:
            return df  # already generated
        retain, header = self.retain, self.include_header
        out_type = (ArrayType(StringType()) if retain
                    else ArrayType(ArrayType(ArrayType(StringType()))))

        @pandas_udf(out_type)
        def tables(s: pd.Series) -> pd.Series:
            from data_juicer_spark.functions.html_tables import \
                extract_tables
            return s.map(lambda t: extract_tables(t, retain, header))

        return df.withColumn(self.tables_field_name,
                             tables(F.col(self.text_key)))
