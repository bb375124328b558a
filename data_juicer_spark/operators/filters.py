"""Filter operators (quality filters) — Spark-native two-phase filters.

Each mirrors a reference op's stat formula (file:line cited per class,
paths under /root/reference/data_juicer/ops/filter/). Cheap stats are
pure Catalyst expressions (whole-stage-codegen'd, pushed ahead of any
Python stage by Catalyst); n-gram repetition stats are numpy-vectorized
pandas UDFs over Arrow batches.
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from data_juicer_spark.functions import text as T
from data_juicer_spark.operators.base import STATS_COL, Filter
from data_juicer_spark.registry import OPERATORS


class _RangeFilter(Filter):
    """Common shape: one stat column, keep if min<=stat<=max.

    Filters whose stat is a pure Catalyst expression override
    ``stat_expr_on(col)`` (stat over an ARBITRARY column expression);
    pandas-UDF stats override ``stat_expr(df)`` directly and stay
    non-fusable. ``stat_expr_on`` is what enables filter fusion: the
    keep decision can then be evaluated inside a higher-order-function
    lambda, which binds the (possibly expensive) upstream text
    expression to a lambda variable that Catalyst CANNOT substitute
    through — so a chain of regexp mappers feeding N fused filters is
    evaluated once per row instead of once per stat/predicate reference
    (measured 4x on the bench cleaning pipeline; the reference's
    INTER_WORDS op fusion, op_fusion.py:14-28, is the analogous
    share-the-tokenization optimization)."""

    stat_key: str = ""

    def __init__(self, min_val=None, max_val=None, **kwargs):
        super().__init__(**kwargs)
        self.min_val = min_val
        self.max_val = max_val

    def stat_expr_on(self, col: Column):
        """Stat as a function of an arbitrary column expression, or
        None when the stat needs a pandas UDF (not HOF-expressible)."""
        return None

    def stat_expr(self, df: DataFrame) -> Column:
        e = self.stat_expr_on(F.col(self.text_key))
        if e is None:
            raise NotImplementedError
        return e

    def keep_on(self, col: Column):
        """Keep decision over an arbitrary text column expression, or
        None when not fusable."""
        e = self.stat_expr_on(col)
        if e is None:
            return None
        return self.keep_between(e, self.min_val, self.max_val)

    def stat_expr_on_refined(self, ws: Column):
        """Stat over a SHARED refined-words array (lowercased,
        special-chars edge-stripped, non-empty — refined_words with
        default params, no aug), or None when the stat is not a
        function of refined words. Fusion binds ONE such array per run
        and word filters derive their stats from it instead of
        re-splitting the text per op — re-deriving the array from the
        text lambda variable inside an interpreted HOF predicate
        measured 11x slower on a 3-word-filter run at sf0.1."""
        return None

    def stat_expr_on_lines(self, col: Column, ls: Column):
        """Stat over (text, SHARED lines array) — the line-shape
        analogue of stat_expr_on_refined; None when not line-based."""
        return None

    def keep_on_refined(self, ws: Column):
        e = self.stat_expr_on_refined(ws)
        if e is None:
            return None
        return self.keep_between(e, self.min_val, self.max_val)

    def stats_exprs(self, df: DataFrame) -> Dict[str, Column]:
        return {self.stat_key: self.stat_expr(df)}

    def keep_expr(self, df: DataFrame) -> Column:
        return self.keep_between(
            F.col(f"{STATS_COL}.{self.stat_key}"), self.min_val, self.max_val
        )

    # NOTE: single-op apply() stays the two-phase base path on purpose:
    # a HOF exists()-lambda predicate drops FilterExec out of
    # whole-stage codegen, which only pays off when it prevents an
    # expensive upstream expression from being re-inlined MANY times —
    # i.e. for runs of >=2 filters, which Pipeline fuses via
    # _FusedFilterRun (pipeline.py). A lone filter keeps codegen.


@OPERATORS.register("text_length_filter")
class TextLengthFilter(_RangeFilter):
    """text_len = len(text) (text_length_filter.py:37-54)."""

    stat_key = "text_len"

    def __init__(self, min_len: int = 10, max_len: int = sys.maxsize, **kw):
        super().__init__(min_val=min_len, max_val=max_len, **kw)

    def stat_expr_on(self, col):
        return T.text_len(col).cast("long")


@OPERATORS.register("words_num_filter")
class WordsNumFilter(_RangeFilter):
    """num_words (words_num_filter.py:27-86). tokenization='space'
    mirrors the reference's default whitespace split; 'regex_bpe' is the
    hermetic stand-in for its sentencepiece mode (GPT2-style pretokenizer
    regex — documented deviation: no model file, same filter contract)."""

    stat_key = "num_words"

    def __init__(self, min_num: int = 10, max_num: int = sys.maxsize,
                 tokenization: str | bool = "space", lang: str = "en",
                 **kw):
        super().__init__(min_val=min_num, max_val=max_num, **kw)
        # reference signature compatibility: its `tokenization` is a
        # BOOL (False = whitespace split, True = per-lang sentencepiece,
        # words_num_filter.py:30-40). False maps onto 'space'; True is
        # LOUD like every other tokenization mode — on CJK text the
        # sentencepiece count differs wildly from any proxy, so a silent
        # stand-in would change keep/drop decisions. The regex-BPE proxy
        # stays available as the EXPLICIT engine mode 'regex_bpe'.
        if tokenization is False:
            tokenization = "space"
        elif tokenization is True:
            raise NotImplementedError(
                "words_num_filter tokenization=True needs the per-lang "
                "sentencepiece model (model dep); opt into the "
                "documented proxy explicitly with tokenization="
                "'regex_bpe' if approximate token counts are acceptable")
        if tokenization not in ("space", "regex_bpe"):
            raise ValueError(f"unsupported tokenization {tokenization!r}")
        self.tokenization = tokenization
        self.lang = lang  # selects the tokenizer model in the reference

    def stat_expr_on(self, col):
        if self.tokenization == "regex_bpe":
            return T.token_count_regex(col).cast("long")
        return T.num_words(col).cast("long")

    def stat_expr_on_refined(self, ws):
        if self.tokenization != "space":
            return None
        # num_words counts exactly the refined words (edge-strip
        # survivors) — size of the shared array; equality with the
        # regexp_count formulation is pinned by the randomized parity
        # fence in tests/test_filters.py
        return F.size(ws).cast("long")


@OPERATORS.register("alphanumeric_filter")
class AlphanumericFilter(_RangeFilter):
    """alnum_ratio = alnum_count/len (alphanumeric_filter.py:26-88)."""

    stat_key = "alnum_ratio"

    def __init__(self, min_ratio: float = 0.25,
                 max_ratio: float = float(sys.maxsize),
                 tokenization: bool = False, **kw):
        if tokenization:
            # loud, not silent: the reference's token mode needs the HF
            # tokenizer (alphanumeric_filter.py:40-66) — falling back to
            # char mode silently would change keep/drop decisions
            raise NotImplementedError(
                "alphanumeric_filter tokenization=True needs the HF "
                "tokenizer (model dep, not in the hermetic build); use "
                "the default char-ratio mode or token_num_filter's "
                "regex-BPE proxy")
        super().__init__(min_val=min_ratio, max_val=max_ratio, **kw)

    def stat_expr_on(self, col):
        return T.alnum_ratio(col)


@OPERATORS.register("average_line_length_filter")
class AverageLineLengthFilter(_RangeFilter):
    """avg_line_length = len/lines (average_line_length_filter.py:11-64)."""

    stat_key = "avg_line_length"

    def __init__(self, min_len: float = 10, max_len: float = float(sys.maxsize), **kw):
        super().__init__(min_val=min_len, max_val=max_len, **kw)

    def stat_expr_on(self, col):
        return T.avg_line_length(col)

    def stat_expr_on_lines(self, col, ls):
        return F.when(F.length(col) == 0, F.lit(0.0)).otherwise(
            F.length(col) / F.size(ls))


@OPERATORS.register("maximum_line_length_filter")
class MaximumLineLengthFilter(_RangeFilter):
    """max_line_length (maximum_line_length_filter.py:11-66)."""

    stat_key = "max_line_length"

    def __init__(self, min_len: int = 10, max_len: int = sys.maxsize, **kw):
        super().__init__(min_val=min_len, max_val=max_len, **kw)

    def stat_expr_on(self, col):
        return T.max_line_length(col).cast("long")

    def stat_expr_on_lines(self, col, ls):
        return F.coalesce(
            F.array_max(F.transform(ls, lambda x: F.length(x))),
            F.lit(0)).cast("long")


@OPERATORS.register("special_characters_filter")
class SpecialCharactersFilter(_RangeFilter):
    """special_char_ratio (special_characters_filter.py:24-62)."""

    stat_key = "special_char_ratio"

    def __init__(self, min_ratio: float = 0.0, max_ratio: float = 0.25, **kw):
        super().__init__(min_val=min_ratio, max_val=max_ratio, **kw)

    def stat_expr_on(self, col):
        return T.special_char_ratio(col)


@OPERATORS.register("token_num_filter")
class TokenNumFilter(_RangeFilter):
    """num_token via BPE-ish regex pretokenizer (token_num_filter.py:22-62
    uses a HF tokenizer; hermetic regex proxy here, same filter shape)."""

    stat_key = "num_token"

    def __init__(self, min_num: int = 10, max_num: int = sys.maxsize,
                 hf_tokenizer: str = "EleutherAI/pythia-6.9b-deduped",
                 **kw):
        # advisory in the hermetic build: the regex-BPE proxy does not
        # load a model, but the reference call-site (hf_tokenizer=...)
        # must construct unchanged (documented deviation)
        self.hf_tokenizer = hf_tokenizer
        super().__init__(min_val=min_num, max_val=max_num, **kw)

    def stat_expr_on(self, col):
        return T.token_count_regex(col).cast("long")


@OPERATORS.register("character_repetition_filter")
class CharacterRepetitionFilter(_RangeFilter):
    """char-level n-gram repetition ratio
    (character_repetition_filter.py:27-82): freqs sorted desc, take
    num_rep = min(floor(sqrt(#distinct)), #distinct - #singletons),
    ratio = sum(top num_rep)/sum(all). Numpy pandas UDF (no Catalyst
    equivalent for n-gram frequency profiles)."""

    stat_key = "char_rep_ratio"

    def __init__(self, rep_len: int = 10, min_ratio: float = 0.0, max_ratio: float = 0.5, **kw):
        super().__init__(min_val=min_ratio, max_val=max_ratio, **kw)
        self.n = rep_len

    def stat_expr(self, df):
        n = self.n

        @pandas_udf(DoubleType())
        def char_rep(s: pd.Series) -> pd.Series:
            # vectorized: utf-8 byte n-grams via a sliding-window view +
            # one C-level np.unique per row (no Python string slicing)
            out = np.zeros(len(s))
            for i, txt in enumerate(s):
                if txt is None:
                    continue
                a = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
                if len(a) < n:
                    continue
                win = np.lib.stride_tricks.sliding_window_view(a, n)
                grams = np.ascontiguousarray(win).view(
                    np.dtype((np.void, n))
                ).ravel()
                _, counts = np.unique(grams, return_counts=True)
                counts = np.sort(counts)[::-1]
                singles = int((counts == 1).sum())
                num_rep = min(int(np.sqrt(len(counts))), len(counts) - singles)
                tot = counts.sum()
                out[i] = counts[:num_rep].sum() / tot if tot else 0.0
            return pd.Series(out)

        return char_rep(F.col(self.text_key))


@OPERATORS.register("word_repetition_filter")
class WordRepetitionFilter(_RangeFilter):
    """word-level n-gram repetition ratio (word_repetition_filter.py:32-118):
    words lowercased + stripped of special chars; ratio = sum(freq>1)/sum(all)."""

    stat_key = "word_rep_ratio"

    def __init__(self, rep_len: int = 10, min_ratio: float = 0.0,
                 max_ratio: float = 0.5, lang: str = "en",
                 tokenization: bool = False, **kw):
        super().__init__(min_val=min_ratio, max_val=max_ratio, **kw)
        if tokenization:
            raise NotImplementedError(
                "word_repetition_filter tokenization=True needs the "
                "per-language sentencepiece model (model dep, not in "
                "the hermetic build); the default whitespace mode "
                "matches the reference's tokenization=False path")
        self.n = rep_len
        self.lang = lang  # selects the tokenizer model in the reference

    def stat_expr(self, df):
        import re as _re

        n = self.n
        # strip special chars from word EDGES with one C regex pass per
        # row (equivalent to words_refinement's per-word strip), then
        # hash words and slide a window — no per-word Python
        cls = "".join(
            "\\" + c if c in r"\^]-[&" else c
            for c in sorted(T.SPECIAL_CHARACTERS)
            if c not in " \t\n\r\x0b\x0c"
        )
        edge_re = _re.compile(rf"(?:(?<=\s)|^)[{cls}]+|[{cls}]+(?=\s|$)")

        @pandas_udf(DoubleType())
        def word_rep(s: pd.Series) -> pd.Series:
            out = np.zeros(len(s))
            for i, txt in enumerate(s):
                if not txt:
                    continue
                ws = edge_re.sub("", txt.lower()).split()
                if len(ws) < n:
                    continue
                # 64-bit word hashes -> rolling n-gram key via sliding window
                h = np.fromiter((hash(w) for w in ws), dtype=np.int64,
                                count=len(ws))
                win = np.lib.stride_tricks.sliding_window_view(h, n)
                grams = np.ascontiguousarray(win).view(
                    np.dtype((np.void, 8 * n))
                ).ravel()
                _, counts = np.unique(grams, return_counts=True)
                tot = counts.sum()
                out[i] = counts[counts > 1].sum() / tot if tot else 0.0
            return pd.Series(out)

        return word_rep(F.col(self.text_key))


@OPERATORS.register("stopwords_filter")
class StopwordsFilter(_RangeFilter):
    """stopwords_ratio against per-language asset lists
    (stopwords_filter.py:34-132: union of per-lang downloadable lists;
    here hermetic in-repo lists, assets/wordlists.py). ``lang`` may be a
    code, a list of codes, or None for all; an explicit ``stopwords``
    list overrides the assets."""

    stat_key = "stopwords_ratio"

    def __init__(self, min_ratio: float = 0.3, max_ratio: float = 1.0,
                 lang="en", stopwords: list | None = None,
                 stopwords_dir: str | None = None,
                 tokenization: bool = False,
                 use_words_aug: bool = False,
                 words_aug_group_sizes=(2,),
                 words_aug_join_char: str = "", **kw):
        super().__init__(min_val=min_ratio, max_val=max_ratio, **kw)
        if tokenization:
            raise NotImplementedError(
                "stopwords_filter tokenization=True needs sentencepiece "
                "(model dep); the default matches tokenization=False")
        from data_juicer_spark.assets import (
            STOPWORDS, load_words_dir, words_for,
        )

        table = load_words_dir(stopwords_dir, "stopwords", STOPWORDS)
        if lang == "all":
            lang = None  # reference: "all" = union of every language
        self.stopwords = stopwords or words_for(table, lang)
        self.use_words_aug = use_words_aug
        self.words_aug_group_sizes = tuple(words_aug_group_sizes)
        self.words_aug_join_char = words_aug_join_char

    def stat_expr_on(self, col):
        return T.stopword_like_ratio(
            col, self.stopwords,
            use_words_aug=self.use_words_aug,
            words_aug_group_sizes=self.words_aug_group_sizes,
            words_aug_join_char=self.words_aug_join_char)

    def stat_expr_on_refined(self, ws):
        return T.stopword_like_ratio_on_refined(
            ws, self.stopwords,
            use_words_aug=self.use_words_aug,
            words_aug_group_sizes=self.words_aug_group_sizes,
            words_aug_join_char=self.words_aug_join_char)


@OPERATORS.register("flagged_words_filter")
class FlaggedWordsFilter(_RangeFilter):
    """flagged_words_ratio (flagged_words_filter.py:39-144); keep when
    ratio <= max. Same per-language asset contract as StopwordsFilter."""

    stat_key = "flagged_words_ratio"

    def __init__(self, *, min_ratio: float = 0.0,
                 max_ratio: float = 0.045,
                 lang="en", flagged_words: list | None = None,
                 flagged_words_dir: str | None = None,
                 tokenization: bool = False,
                 use_words_aug: bool = False,
                 words_aug_group_sizes=(2,),
                 words_aug_join_char: str = "", **kw):
        super().__init__(min_val=min_ratio, max_val=max_ratio, **kw)
        if tokenization:
            raise NotImplementedError(
                "flagged_words_filter tokenization=True needs "
                "sentencepiece (model dep); default matches "
                "tokenization=False")
        from data_juicer_spark.assets import (
            FLAGGED_WORDS, load_words_dir, words_for,
        )

        table = load_words_dir(flagged_words_dir, "flagged_words",
                               FLAGGED_WORDS)
        if lang == "all":
            lang = None  # reference: "all" = union of every language
        self.flagged = flagged_words or words_for(table, lang)
        self.use_words_aug = use_words_aug
        self.words_aug_group_sizes = tuple(words_aug_group_sizes)
        self.words_aug_join_char = words_aug_join_char

    def stat_expr_on(self, col):
        return T.stopword_like_ratio(
            col, self.flagged,
            use_words_aug=self.use_words_aug,
            words_aug_group_sizes=self.words_aug_group_sizes,
            words_aug_join_char=self.words_aug_join_char)

    def stat_expr_on_refined(self, ws):
        return T.stopword_like_ratio_on_refined(
            ws, self.flagged,
            use_words_aug=self.use_words_aug,
            words_aug_group_sizes=self.words_aug_group_sizes,
            words_aug_join_char=self.words_aug_join_char)


@OPERATORS.register("language_id_score_filter")
class LanguageIdScoreFilter(Filter):
    """lang + lang_score via hermetic n-gram/stopword heuristic LID
    (language_id_score_filter.py:22-70 uses fastText; same contract:
    stats.lang, stats.lang_score; keep if lang in langs and score >= min).
    Vectorized pandas UDF returning a struct."""

    LANG_MARKERS = {
        "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
        "es": ["el", "la", "de", "que", "y", "los", "las", "una", "por", "como"],
        "fr": ["le", "la", "les", "des", "est", "dans", "que", "une", "pour", "avec"],
        "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "für"],
    }

    def __init__(self, lang=None, min_score: float = 0.8, **kw):
        super().__init__(**kw)
        # reference default is lang="" = "keep any language, only score
        # gates" (language_id_score_filter.py:22-70) — falsy lang (None,
        # "", []) must mean no-language-restriction, not membership in
        # {""}
        if not lang:
            lang = None
        elif isinstance(lang, str):
            lang = [lang]
        self.langs = lang
        self.min_score = min_score

    def stats_exprs(self, df):
        markers = self.LANG_MARKERS

        @pandas_udf(StructType([
            StructField("lang", StringType()),
            StructField("lang_score", DoubleType()),
        ]))
        def lid(s: pd.Series) -> pd.DataFrame:
            langs, scores = [], []
            for txt in s:
                ws = [w.lower() for w in (txt or "").split()]
                if not ws:
                    langs.append(""); scores.append(0.0); continue
                best_lang, best = "", 0.0
                has_cjk = any("一" <= c <= "鿿" for c in (txt or "")[:2000])
                if has_cjk:
                    total = min(len(txt), 2000)
                    cjk = sum(1 for c in txt[:2000] if "一" <= c <= "鿿")
                    best_lang, best = "zh", cjk / total
                else:
                    for lg, mk in markers.items():
                        mset = set(mk)
                        hit = sum(1 for w in ws if w in mset) / len(ws)
                        sc = min(1.0, hit * 5.0)
                        if sc > best:
                            best_lang, best = lg, sc
                langs.append(best_lang); scores.append(float(best))
            return pd.DataFrame({"lang": langs, "lang_score": scores})

        st = lid(F.col(self.text_key))
        return {"lang": st["lang"], "lang_score": st["lang_score"]}

    def keep_expr(self, df):
        cond = F.col(f"{STATS_COL}.lang_score") >= F.lit(self.min_score)
        if self.langs:
            cond = cond & F.col(f"{STATS_COL}.lang").isin(self.langs)
        return cond


@OPERATORS.register("perplexity_filter")
class PerplexityFilter(_RangeFilter):
    """perplexity-style quality score (perplexity_filter.py:28-81 uses
    KenLM; hermetic proxy: character-bigram cross-entropy against English
    letter-pair statistics, rounded to 1 decimal like the reference's
    round(ppl,1)). Lower = more natural; keep if ppl <= max."""

    stat_key = "perplexity"

    # log10 frequencies of common English bigrams (coarse, hermetic)
    _COMMON = set(
        "th he in er an re nd on en at ou ed ha to or it is hi es ng"
        " te se me of le no ea ve co st ri ar nt li al sa as ne de we"
        " ti ll so la ta el ma io ic om ur ca us pe ho ra et ce be".split()
    )

    def __init__(self, max_ppl: float = 1500, min_ppl: float = 0,
                 lang: str = "en", **kw):
        super().__init__(min_val=min_ppl, max_val=max_ppl, **kw)
        self.lang = lang  # selects the KenLM model in the reference

    def stat_expr(self, df):
        # fully batch-vectorized: all rows concatenated into ONE byte
        # buffer (with \0 separators that can never be common bigrams),
        # bigram codes = 16-bit byte pairs, membership via np.isin, and
        # per-row hit sums via one np.add.reduceat — no Python per row
        common_codes = np.unique(np.array(
            [(ord(b[0]) << 8) | ord(b[1]) for b in self._COMMON], dtype=np.uint16
        ))

        @pandas_udf(DoubleType())
        def ppl(s: pd.Series) -> pd.Series:
            enc = [(t or "").lower().encode("utf-8") for t in s]
            lens = np.fromiter((len(e) for e in enc), dtype=np.int64,
                               count=len(enc))
            buf = b"\0".join(enc)
            if len(buf) < 2:
                return pd.Series(np.full(len(s), 10000.0))
            a = np.frombuffer(buf, dtype=np.uint8)
            codes = (a[:-1].astype(np.uint16) << 8) | a[1:]
            hit = np.isin(codes, common_codes)
            starts = np.zeros(len(enc), dtype=np.int64)
            np.cumsum(lens[:-1] + 1, out=starts[1:])
            # reduceat over [starts[i], starts[i+1]): includes the \0
            # boundary bigrams, which are never hits
            # clip only affects degenerate tail rows (len<2), which are
            # overridden by the lens<2 mask below
            bounds = np.minimum(starts, len(hit) - 1)
            sums = np.add.reduceat(hit, bounds)
            n_bigrams = np.maximum(lens - 1, 1)
            rate = np.maximum(sums / n_bigrams, 1e-4)
            out = 10.0 / rate
            out[lens < 2] = 10000.0
            return pd.Series(out)

        # round(ppl, 1) like the reference (perplexity_filter.py:72) —
        # rounded JVM-side (HALF_UP) so SQL oracles agree on ties, not
        # numpy's HALF_EVEN
        return F.round(ppl(F.col(self.text_key)), 1)


@OPERATORS.register("suffix_filter")
class SuffixFilter(Filter):
    """keep if suffix column ∈ suffixes (suffix_filter.py:10-44,
    NON_STATS filter). Exposes keep_expr (no stats) so the CDC flag-mode
    pipeline can AND it into the keep flag instead of dropping rows."""

    def __init__(self, suffixes=(), suffix_key: str = "suffix", **kw):
        super().__init__(**kw)
        self.suffixes = list(suffixes) if not isinstance(suffixes, str) else [suffixes]
        self.suffix_key = suffix_key

    def stats_exprs(self, df):
        return {}

    def keep_expr(self, df):
        if not self.suffixes:
            return F.lit(True)
        return F.col(self.suffix_key).isin(self.suffixes)


@OPERATORS.register("specified_field_filter")
class SpecifiedFieldFilter(Filter):
    """keep if field value ∈ target list (specified_field_filter.py:25-68):
    list-valued fields keep only when ALL elements are targets; empty
    field_key/target keeps everything; reversed_range negates."""

    def __init__(self, field_key: str = "", target_value=(), **kw):
        super().__init__(**kw)
        self.field_key = field_key
        self.target = list(target_value)

    def stats_exprs(self, df):
        return {}

    def keep_expr(self, df):
        if not (self.field_key and self.target):
            return F.lit(True)
        col = F.col(self.field_key)
        dt = df.select(col).schema[0].dataType
        from pyspark.sql import types as _T
        if isinstance(dt, _T.ArrayType):
            keep = F.forall(col, lambda x: x.isin(self.target))
        else:
            keep = col.isin(self.target)
        # null field/element → False like the reference's `in` check,
        # so reversed_range KEEPS null rows (三-valued ~NULL would drop)
        keep = F.coalesce(keep, F.lit(False))
        if self.reversed_range:
            keep = ~keep
        return keep


@OPERATORS.register("specified_numeric_field_filter")
class SpecifiedNumericFieldFilter(Filter):
    """keep if min<=field<=max (specified_numeric_field_filter.py:36-81):
    string values parse as floats (is_number contract), non-numbers and
    nulls DROP, empty field_key keeps everything."""

    def __init__(self, field_key: str = "", min_value=None, max_value=None, **kw):
        super().__init__(**kw)
        self.field_key = field_key
        self.min_value, self.max_value = min_value, max_value

    def stats_exprs(self, df):
        return {}

    def keep_expr(self, df):
        if not self.field_key:
            return F.lit(True)
        # try_cast: numeric strings compare as numbers; non-numbers
        # become null, and null comparisons drop the row (reference
        # returns False for non-numbers, before any reversal)
        return self.keep_between(
            F.col(self.field_key).try_cast("double"),
            self.min_value, self.max_value
        )


def _python_condition_to_column(cond: str):
    """Compile the reference's PYTHON-syntax filter condition
    (general_field_filter.py:21-100: and/or/not, the six comparison
    ops including CHAINED comparisons like ``10 < num <= 30``, dotted
    field names) into one Catalyst Column. Returns None when the
    condition uses a construct outside that grammar — the caller falls
    back to Spark SQL, which is this engine's superset extension."""
    import ast

    OPS = {ast.Gt: Column.__gt__, ast.Lt: Column.__lt__,
           ast.Eq: Column.__eq__, ast.NotEq: Column.__ne__,
           ast.GtE: Column.__ge__, ast.LtE: Column.__le__}

    def conv(node):
        if isinstance(node, ast.Expression):
            return conv(node.body)
        if isinstance(node, ast.BoolOp):
            parts = [conv(v) for v in node.values]
            out = parts[0]
            for p in parts[1:]:
                out = (out & p) if isinstance(node.op, ast.And) else (out | p)
            return out
        if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.Not):
            return ~conv(node.operand)
        if isinstance(node, ast.Compare):
            left, out = conv(node.left), None
            for op, comparator in zip(node.ops, node.comparators):
                if type(op) not in OPS:
                    raise ValueError("unsupported comparison")
                right = conv(comparator)
                c = OPS[type(op)](left, right)
                out = c if out is None else out & c
                left = right  # chained comparison
            return out
        if isinstance(node, ast.Name):
            return F.col(node.id)
        if isinstance(node, ast.Attribute):  # dotted field name a.b.c
            parts, cur = [], node
            while isinstance(cur, ast.Attribute):
                parts.append(cur.attr)
                cur = cur.value
            if not isinstance(cur, ast.Name):
                raise ValueError("unsupported attribute base")
            parts.append(cur.id)
            return F.col(".".join(reversed(parts)))
        if isinstance(node, ast.Constant):
            return F.lit(node.value)
        raise ValueError("unsupported construct")

    try:
        return conv(ast.parse(cond, mode="eval"))
    except (SyntaxError, ValueError):
        return None


@OPERATORS.register("general_field_filter")
class GeneralFieldFilter(Filter):
    """boolean condition over fields (general_field_filter.py:21-100):
    the reference's Python-expression grammar — and/or/not, chained
    comparisons, dotted names — compiles to one Catalyst Column; any
    condition outside that grammar falls back to Spark SQL `expr`
    (an engine-superset extension). Empty condition keeps everything."""

    def __init__(self, filter_condition: str = "", **kw):
        super().__init__(**kw)
        self.condition = filter_condition.strip()

    def stats_exprs(self, df):
        return {}

    def keep_expr(self, df):
        if not self.condition:
            return F.lit(True)
        compiled = _python_condition_to_column(self.condition)
        return compiled if compiled is not None else F.expr(self.condition)


@OPERATORS.register("text_quality_score_filter")
class TextQualityScoreFilter(_RangeFilter):
    """NEW (training-data pipeline op, not in reference): composite
    quality score in [0,1] from length / alnum ratio / stopword ratio /
    line-shape — all Catalyst expressions."""

    stat_key = "quality_score"

    def __init__(self, min_score: float = 0.3, max_score: float = 1.0, **kw):
        super().__init__(min_val=min_score, max_val=max_score, **kw)

    def stat_expr_on(self, c):
        len_score = F.least(T.text_len(c) / F.lit(1000.0), F.lit(1.0))
        alnum = T.alnum_ratio(c)
        from data_juicer_spark.assets import STOPWORDS

        # engine-extra score: keep the pre-r4 unstripped formula so the
        # composite stays stable (reference parity is the stopwords op)
        stop = T.stopword_like_ratio(c, STOPWORDS["en"], strip_special=False)
        stop_score = F.least(stop * 4.0, F.lit(1.0))
        return F.round(
            len_score * 0.25 + alnum * 0.45 + stop_score * 0.30, 6
        )


@OPERATORS.register("text_pair_similarity_filter")
class TextPairSimilarityFilter(Filter):
    """Keep rows where the cosine similarity between a PAIR of embedding
    columns is in range (text_pair_similarity_filter shape: the
    reference embeds `text` and `target_text` with a HF model and
    compares; hermetic version compares two provided embedding columns —
    the model step is a serving dep, the similarity contract is this).
    Pure higher-order-function dot product, NULL-safe (try_divide)."""

    def __init__(self, first_key: str = "embedding",
                 second_key: str = "embedding2",
                 min_score: float = 0.1, max_score: float = 1.0,
                 text_key_second: str | None = None,
                 any_or_all: str = "any",
                 hf_clip: str | None = None,
                 trust_remote_code: bool = False, **kw):
        # reference params (text_pair_similarity_filter.py): hf_clip is
        # the embedding model (serving dep — embeddings arrive
        # precomputed in columns here); text_key_second names the second
        # TEXT column, which maps onto second_key's embedding column;
        # any_or_all is validated for call-site parity (single-pair
        # semantics are identical under both)
        if any_or_all not in ("any", "all"):
            raise ValueError(
                f"Keep strategy [{any_or_all}] is not supported. "
                f'Can only be one of ["any", "all"].')
        if text_key_second is not None:
            second_key = text_key_second
        super().__init__(**kw)
        self.first_key = first_key
        self.second_key = second_key
        self.min_score, self.max_score = min_score, max_score

    def stats_exprs(self, df):
        from data_juicer_spark.functions.similarity import cosine

        d = lambda c: F.transform(F.col(c), lambda x: x.cast("double"))  # noqa: E731
        return {"pair_sim": F.round(
            cosine(d(self.first_key), d(self.second_key)), 6)}

    def keep_expr(self, df):
        return self.keep_between(
            F.col(f"{STATS_COL}.pair_sim"), self.min_score, self.max_score)


@OPERATORS.register("text_embd_similarity_filter")
class TextEmbdSimilarityFilter(Filter):
    """Keep rows whose embedding's cosine similarity to a reference
    centroid is in range (text_embd_similarity_filter.py shape; the
    reference scores vs API embeddings — here vs a provided/derived
    centroid vector, hermetic). Pure higher-order-function dot product.
    """

    def __init__(self, embedding_key: str = "embedding", centroid=None,
                 min_score: float = 0.1, max_score: float = 1.0,
                 api_or_hf_model: str | None = None,
                 is_hf_model: bool = False,
                 api_endpoint: str | None = None,
                 response_path: str | None = None,
                 model_params: dict | None = None,
                 valid_dataset=None, ebd_dim: int | None = None,
                 pooling: str | None = None,
                 input_template: str | None = None, **kw):
        # reference params (text_embd_similarity_filter.py) select the
        # embedding MODEL/API — a serving dep this hermetic engine
        # replaces with precomputed embedding columns. ANY of them set
        # means the caller expects model serving, so fail loudly (the
        # reference's API mode is the default is_hf_model=False, and
        # valid_dataset's centroid is computed BY the model — it cannot
        # be mapped silently onto the input-mean fallback)
        if api_or_hf_model is not None or api_endpoint is not None \
                or valid_dataset is not None:
            raise NotImplementedError(
                "embedding model serving (API/HF) and valid_dataset "
                "centroids are not available in the hermetic build; "
                "supply a precomputed embedding column and (optionally) "
                "an explicit centroid")
        super().__init__(**kw)
        self.embedding_key = embedding_key
        self.centroid = centroid
        self.min_score, self.max_score = min_score, max_score

    def _vec_d(self):
        return F.transform(F.col(self.embedding_key), lambda x: x.cast("double"))

    def stats_exprs(self, df):
        from data_juicer_spark.functions.similarity import cosine

        cvec = F.array(*[F.lit(float(v)) for v in self.centroid])
        return {"embd_sim": F.round(cosine(self._vec_d(), cvec), 6)}

    def compute_stats(self, df):
        if self.centroid is not None:
            return super().compute_stats(df)
        # default centroid = dataset mean vector, computed LAZILY: a
        # posexplode→avg-per-position→reassemble subquery broadcast-joined
        # onto every row. Zero driver actions at plan-build time (the old
        # path ran .first()+.collect()+.count() = two full scans before
        # the operator even returned a plan).
        from data_juicer_spark.functions.similarity import cosine
        from data_juicer_spark.operators.base import merge_stats

        cent = (
            df.select(F.posexplode(self._vec_d()).alias("__pos__", "__x__"))
            .groupBy("__pos__").agg(F.avg("__x__").alias("__m__"))
            .agg(F.sort_array(F.collect_list(F.struct("__pos__", "__m__")))
                 .getField("__m__").alias("__cent__"))
        )
        out = merge_stats(
            df.crossJoin(F.broadcast(cent)),
            {"embd_sim": F.round(cosine(self._vec_d(), F.col("__cent__")), 6)},
        )
        return out.drop("__cent__")

    def keep_expr(self, df):
        from data_juicer_spark.operators.base import STATS_COL

        return self.keep_between(
            F.col(f"{STATS_COL}.embd_sim"), self.min_score, self.max_score)
