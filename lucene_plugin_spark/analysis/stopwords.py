"""The Lucene English default stop set (33 words).

The reference instantiates ``StandardAnalyzer`` with its default stop set for
both indexing and query parsing (LuceneIndexBean.java:666,727-735).  This is
the publicly documented ``StopAnalyzer.ENGLISH_STOP_WORDS_SET`` of Lucene —
33 common English words.  Stopwords are removed from the token stream but
their *positions are preserved* (position increments), so phrase queries skip
over them correctly (SURVEY.md §2.7.6).
"""

ENGLISH_STOP_WORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by",
        "for", "if", "in", "into", "is", "it", "no", "not", "of",
        "on", "or", "such", "that", "the", "their", "then", "there",
        "these", "they", "this", "to", "was", "will", "with",
    }
)

# SQL literal list for DuckDB-oracle parity (used by __spark_entry__.oracle_sql).
STOPWORDS_SQL_LIST = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
