"""BM25 ranked retrieval as a reusable operator.

The lexical-search twin of the kNN embedding family (similarity.py):
tokenize → per-doc term frequencies for the QUERY terms only → per-term
document frequencies (a tiny broadcast) → one map-side-combinable
per-doc score sum.  At 100 TB the only large shuffle is the
per-(doc, term) tf aggregate over the term-filtered token stream —
|terms|/|vocab| of the exploded tokens — and the df/idf side is
|terms| rows.

Exactness discipline (queries/util.py): tf/df/dl are exact integers,
avgdl and every score factor are IEEE doubles computed with the same
association the SQL oracle uses, and ranking is on the EPS-nudged
ROUNDED score with an id tiebreak so rank ties agree bit-for-bit
across engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from core2_spark.queries.util import EPS, sql_quote


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 15,
    corpus_stats: tuple[int, float] | None = None,
) -> DataFrame:
    """Top-``topk`` documents for ``terms`` under BM25(k1, b).

    Output: (id_col, bm25_score rounded to 4, matched_terms), ordered
    by (bm25_score DESC, id_col) — deterministic under ties.

    Scale boundary: the two corpus scalars (doc count, average doc
    length) are bounded 1-row collects, but each is a full-corpus
    aggregate job executed BEFORE the main pipeline.  Fine per ad-hoc
    query; when the operator runs per-query over a query SET against
    the same corpus, precompute them once and pass
    ``corpus_stats=(n_docs, avgdl)`` so the corpus is scanned once,
    not 2×|queries| times.
    """
    if not terms:
        raise ValueError("bm25_topk: terms must be non-empty")
    # r11 restructure (guide §2.3 "shuffle fewer bytes" + §8 "one pass
    # over the heavy data"): the pre-r11 shape scanned and tokenized
    # the CORPUS TEXT three times — (a) an explode+groupBy over the
    # whole token stream just to count tokens per doc, (b) the
    # term-filtered tf explode, and (c) a DUPLICATE of (b), because
    # deriving idf as tf.groupBy().agg() makes Catalyst evaluate the
    # tf subtree twice (once under the broadcast, once under the
    # join; the r11 plan audit shows 3 `Generate explode` nodes).
    # Now: per-doc length is the map-side expression
    # size(filter(split(...))) carried THROUGH the tf explode (min()
    # of a per-doc constant recovers it after the aggregate), and df
    # is a count window over tf partitioned by term — so the text is
    # scanned and tokenized exactly ONCE, and only |matching tokens|
    # rows ever reach an exchange.  At 100 TB the corpus scan is the
    # dominant cost; this is a 3×→1× on it.  Equivalence: dl per doc,
    # df per term, and every score factor are value-identical
    # (oracle-checked + hypothesis random differential).
    # greatest(·, 0): under non-ANSI legacy sizeOfNull semantics,
    # size(NULL) is -1 and a NULL-text doc would SUBTRACT one token
    # from the corpus total (the pre-r11 exploded-token sum simply
    # contributed nothing); greatest maps both NULL and -1 to 0 so
    # avgdl is config-independent (ADVICE r12).  Docs with text are
    # unaffected (size >= 0).
    dl_expr = F.greatest(
        F.size(F.filter(F.split(F.col(text_col), " "), lambda x: x != "")),
        F.lit(0),
    )
    if corpus_stats is not None:
        n_docs, avgdl = corpus_stats
    else:
        # ONE bounded scalar job for both corpus stats (was two: a
        # count plus a sum over the exploded-token aggregate).
        row = docs.agg(
            F.count("*").alias("n"), F.sum(dl_expr).alias("t")
        ).collect()[0]
        n_docs, total_tokens = row["n"], row["t"]
        # Degenerate corpora: an empty table (n_docs=0) or an all-empty-
        # text one (total_tokens NULL/0) produces zero tf rows, so no row
        # ever reaches the score expression — any finite avgdl placeholder
        # gives the same (empty) result while avoiding 0/0 and float(None).
        if not n_docs or not total_tokens:
            avgdl = 1.0
        else:
            avgdl = float(total_tokens) / n_docs
    toks = docs.select(
        id_col,
        dl_expr.alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("term"),
    ).filter(F.col("term") != "")
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"), F.min("dl").alias("dl"))
    )
    from pyspark.sql.window import Window

    per_term = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .select(
            id_col,
            (
                F.log(
                    F.lit(1)
                    + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("term_score"),
        )
    )
    return (
        per_term.groupBy(id_col)
        .agg(
            F.round(F.sum("term_score") + F.lit(EPS), 4).alias("bm25_score"),
            F.count("*").alias("matched_terms"),
        )
        .orderBy(F.col("bm25_score").desc(), F.col(id_col))
        .limit(topk)
    )


def bm25_oracle_sql(
    terms: Sequence[str],
    *,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 15,
) -> str:
    """DuckDB mirror of :func:`bm25_topk` with the same association in
    every score factor (see module docstring)."""
    if not terms:
        raise ValueError("bm25_oracle_sql: terms must be non-empty")
    quoted = ", ".join(sql_quote(t) for t in terms)
    return f"""
    WITH toks AS (
        SELECT {id_col}, unnest(string_split({text_col}, ' ')) AS term
        FROM {table}
    ),
    toks_ne AS (SELECT {id_col}, term FROM toks WHERE term <> ''),
    dl AS (SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS dl
           FROM toks_ne GROUP BY {id_col}),
    corpus AS (
        SELECT CAST((SELECT COUNT(*) FROM {table}) AS DOUBLE) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / (SELECT COUNT(*) FROM {table}) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT {id_col}, term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks_ne
        WHERE term IN ({quoted})
        GROUP BY {id_col}, term
    ),
    idf AS (
        SELECT term, CAST(COUNT(*) AS BIGINT) AS df
        FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.{id_col},
               SUM(
                   ln(1 + (corpus.n_docs - idf.df + 0.5) / (idf.df + 0.5))
                   * tf.tf
                   / (tf.tf + {k1!r} * (1 - {b!r} + {b!r} * dl.dl / corpus.avgdl))
               ) AS score,
               CAST(COUNT(*) AS BIGINT) AS matched_terms
        FROM tf
        JOIN dl ON dl.{id_col} = tf.{id_col}
        JOIN idf ON idf.term = tf.term
        CROSS JOIN corpus
        GROUP BY tf.{id_col}
    )
    SELECT {id_col},
           ROUND(score + 0.000000001, 4) AS bm25_score,
           matched_terms
    FROM scored
    ORDER BY bm25_score DESC, {id_col}
    LIMIT {topk}
    """
