"""Hermetic per-language word-list assets.

The reference downloads per-language stopword / flagged-word assets at
runtime (filter/stopwords_filter.py:34-132, flagged_words_filter.py:39-144
via utils/model_utils prepare lists). This engine must be hermetic, so a
compact self-authored set of common function words per language ships in
the repo instead — same contract (union of per-lang lists, lowercase
membership), documented deviation: lists are much smaller than the
reference's downloadable assets; pass explicit ``stopwords=[...]`` /
``flagged_words=[...]`` for production-grade lists.
"""

STOPWORDS = {
    "en": [
        "the", "a", "an", "and", "or", "but", "if", "then", "of", "in",
        "on", "at", "to", "for", "with", "by", "from", "as", "is", "are",
        "was", "were", "be", "been", "it", "this", "that", "these",
        "those", "he", "she", "they", "we", "you", "i", "not", "no",
        "do", "does", "did", "have", "has", "had", "will", "would",
        "can", "could", "should", "my", "your", "his", "her", "its",
        "their", "our", "so", "than", "too", "very", "just", "about",
    ],
    "es": [
        "el", "la", "los", "las", "un", "una", "unos", "unas", "y", "o",
        "pero", "si", "de", "del", "en", "a", "al", "por", "para", "con",
        "sin", "sobre", "es", "son", "era", "eran", "ser", "estar",
        "que", "como", "su", "sus", "mi", "tu", "se", "lo", "le", "les",
        "me", "te", "nos", "no", "ya", "muy", "más", "este", "esta",
        "ese", "esa", "hay", "fue", "ha", "han", "cuando", "donde",
    ],
    "fr": [
        "le", "la", "les", "un", "une", "des", "du", "de", "et", "ou",
        "mais", "si", "dans", "sur", "sous", "avec", "sans", "pour",
        "par", "est", "sont", "était", "être", "avoir", "que", "qui",
        "quoi", "comme", "son", "sa", "ses", "mon", "ma", "mes", "ton",
        "ta", "tes", "se", "ce", "cette", "ces", "il", "elle", "ils",
        "elles", "nous", "vous", "je", "tu", "ne", "pas", "plus", "très",
        "aussi", "quand", "où",
    ],
    "de": [
        "der", "die", "das", "den", "dem", "des", "ein", "eine", "einen",
        "einem", "eines", "und", "oder", "aber", "wenn", "dann", "von",
        "in", "an", "auf", "mit", "ohne", "für", "durch", "ist", "sind",
        "war", "waren", "sein", "haben", "hat", "hatte", "dass", "wie",
        "sein", "ihr", "ihre", "mein", "dein", "sich", "es", "er", "sie",
        "wir", "nicht", "kein", "schon", "sehr", "auch", "nur", "noch",
        "als", "wo", "wann",
    ],
    "zh": [
        "的", "了", "和", "是", "在", "我", "有", "他", "这", "中",
        "大", "来", "上", "国", "个", "到", "说", "们", "为", "子",
        "和", "你", "地", "出", "道", "也", "时", "年", "得", "就",
        "那", "要", "下", "以", "生", "会", "自", "着", "去", "之",
    ],
}

# Per-language flagged-word demo lists — placeholders with the same
# union-by-lang contract; real deployments pass explicit lists.
FLAGGED_WORDS = {
    "en": ["badword", "flagged", "nsfw", "offensive", "slur"],
    "es": ["prohibido", "ofensivo"],
    "fr": ["interdit", "offensant"],
    "de": ["verboten", "anstößig"],
    "zh": ["敏感词", "违禁词"],
}


def words_for(table: dict, lang) -> list:
    """Union of per-language lists; lang may be a str, list, or None
    (None = all languages), mirroring the reference's lang handling."""
    if lang is None:
        langs = list(table)
    elif isinstance(lang, str):
        langs = [lang]
    else:
        langs = list(lang)
    out, seen = [], set()
    for lg in langs:
        for w in table.get(lg, ()):
            if w not in seen:
                seen.add(w)
                out.append(w)
    return out
