"""Hermetic asset lists (stopwords, flagged words) shipped in-repo."""

from data_juicer_spark.assets.wordlists import (  # noqa: F401
    FLAGGED_WORDS, STOPWORDS, load_words_dir, words_for,
)
