"""Fuzzy string matching / entity resolution: q-gram blocked candidate
generation + edit-distance verification.

The scalable shape for "join these two tables on approximately-equal
strings": never all-pairs — candidates come from an inverted-index equi-join
on shared q-grams (the same bucket-join discipline as the MinHash/Jaccard
dedup family in :mod:`sparkfusion.llm.dedup`), with a ``max_df`` cap dropping
corpus-stopword grams (shared by everything, discriminative of nothing) so no
hot gram can flood the join m². Every candidate is then verified with exact
Levenshtein distance — precision is 1.0 by construction; recall is governed
by the blocking (a pair sharing NO surviving gram is never considered), which
is the standard, documented trade of blocking-based ER.

Reference repo has no fuzzy surface; this extends §2.3 joins the way
j9/j10 extend them temporally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioning import repartition_for_compute


def qgrams(df: DataFrame, id_col: str, text_col: str, q: int = 4) -> DataFrame:
    """Explode each string into its positional q-grams → ``(id, gram)``.
    Repartitions by id BEFORE the explode so row growth spreads across the
    cluster (CLAUDE.md posture)."""
    return (
        repartition_for_compute(df, id_col)
        .select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"transform(sequence(1, greatest(length({text_col}) - {q - 1}, 0)),"
                    f" g -> substr({text_col}, g, {q}))"
                )
            ).alias("gram"),
        )
        .distinct()
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_text: str,
    right_id: str,
    right_text: str,
    max_dist: int = 1,
    q: int = 4,
    max_df: int | None = 50,
) -> DataFrame:
    """Blocked fuzzy join: pairs of (left, right) rows sharing at least one
    surviving q-gram, verified ``levenshtein(left_text, right_text) <=
    max_dist``. Returns ``(left_id, right_id, dist)``.

    ``max_df`` drops grams whose document frequency (across BOTH sides)
    exceeds the cap — without it, a gram present in every row floods the
    candidate join with |L|·|R| pairs (the m² failure mode; same guard as
    ``llm.dedup.cap_shingle_df``). Candidates are distinct (lid, rid) keys
    only; names join back by id for the verify step, so the wide strings
    never ride through the gram shuffle.

    Scale note (measured sf0.1→sf1: 9.3× time for 10× rows — the join is
    linear in surviving-gram postings): an ABSOLUTE cap keeps the per-gram
    join bounded (≤ max_df² pairs/gram) but silently lowers recall as the
    corpus grows, because discriminative grams cross the fixed threshold.
    In production set ``max_df`` as a corpus fraction (like cap_shingle_df's
    documented ≈20 % default) and re-tune q upward for short-key corpora;
    the suite entry pins an absolute cap only so the DuckDB oracle can
    mirror it exactly.
    """
    # the gram frames feed both the df-count pass and the candidate join;
    # deliberately NOT cached — measured slower (cache materializes every
    # ubiquitous-gram row, while recompute is a map-side explode + one
    # distinct shuffle, and at 100 TB a >=10x-corpus cached frame spills)
    lg = qgrams(left, left_id, left_text, q).select(
        F.col(left_id).alias("__lid"), "gram"
    )
    rg = qgrams(right, right_id, right_text, q).select(
        F.col(right_id).alias("__rid"), "gram"
    )
    if max_df is not None:
        df_counts = (
            lg.select("gram")
            .unionByName(rg.select("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("gram")
        )
        lg = lg.join(df_counts, "gram")
        rg = rg.join(df_counts, "gram")
    cand = lg.join(rg, "gram").select("__lid", "__rid").distinct()
    lnames = left.select(F.col(left_id).alias("__lid"), F.col(left_text).alias("__lt"))
    rnames = right.select(
        F.col(right_id).alias("__rid"), F.col(right_text).alias("__rt")
    )
    return (
        cand.join(lnames, "__lid")
        .join(rnames, "__rid")
        .withColumn("dist", F.levenshtein(F.col("__lt"), F.col("__rt")))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            "dist",
        )
    )


def weighted_word_cosine_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_words: str,
    right_id: str,
    right_words: str,
    max_df: int = 50,
    threshold: float = 0.5,
    inv_scale: int = 1_000_000,
) -> DataFrame:
    """Rarity-weighted word-vector COSINE join — the record-linkage
    similarity for longer strings where a single edit-distance budget
    (``fuzzy_join``) stops making sense: each side's rows become sparse
    word vectors weighted by tf · floor(inv_scale / √df) (an integer
    inverse-document-frequency surrogate: √ is IEEE-correctly-rounded in
    every engine so the quantized weight is exact everywhere, and the
    √-damping tracks idf's hapax-vs-stopword ratio far better than a raw
    1/df, which lets single-occurrence noise shingles drown the signal —
    ln(N/df) itself would drag libm in), pairs are generated by
    the inverted-index equi-join on shared words (``max_df`` drops
    corpus-stopwords so no hot word floods the join — the fuzzy_join /
    MinHash discipline), dot products are exact BIGINT sums, and only the
    final cosine touches doubles (round-9, fixed expression order).
    Returns ``(lid, rid, cos)`` with cos ≥ threshold.

    Inputs are ``(id, word)`` relations (pre-tokenized, may carry
    duplicates = term frequency). df counts distinct containing rows
    across BOTH sides, so the weighting is symmetric.
    """
    lw = left.select(F.col(left_id).alias("lid"), F.col(left_words).alias("word"))
    rw = right.select(F.col(right_id).alias("rid"), F.col(right_words).alias("word"))

    df_counts = (
        lw.select(F.col("word"), F.col("lid").alias("rid")).distinct()
        .unionByName(rw.select("word", "rid").distinct())
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select(
            "word",
            F.floor(
                F.lit(float(inv_scale)) / F.sqrt(F.col("df").cast("double"))
            ).cast("long").alias("iw"),
        )
        # df_counts feeds BOTH sides' weighting joins; without materialization
        # each consumer re-runs the two distinct-explode pipelines under it
        .localCheckpoint(eager=False)
    )

    def side(rel: DataFrame, idc: str) -> DataFrame:
        tf = rel.groupBy(idc, "word").agg(F.count(F.lit(1)).alias("tf"))
        return tf.join(df_counts, "word").select(
            idc, "word", (F.col("tf") * F.col("iw")).alias("w")
        )

    # each weighted postings frame feeds TWO subtrees (its norm aggregate and
    # the dot-product join); the r10 plan audit found the er2 executed plan
    # carried 12 copies of the tokenize+explode pipeline with zero
    # ReusedExchange — materializing lv/rv (and df_counts above) cuts it to
    # one evaluation per relation (A/B'd solo at sf0.1: 3.40s → see
    # BASELINE.md round-12 notes)
    lv = side(lw, "lid").localCheckpoint(eager=False)
    rv = side(rw, "rid").localCheckpoint(eager=False)
    ln = lv.groupBy("lid").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nl")
    )
    rn = rv.groupBy("rid").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nr")
    )
    dots = (
        lv.withColumnRenamed("w", "wl")
        .join(rv.withColumnRenamed("w", "wr"), "word")
        .groupBy("lid", "rid")
        .agg(F.sum(F.col("wl") * F.col("wr")).alias("dot"))
    )
    # norm frames are |rows|-sized — plain equi-joins (AQE broadcasts them
    # at test scale; at 1e9 rows they shuffle on the id, which is correct)
    return (
        dots.join(ln, "lid")
        .join(rn, "rid")
        .select(
            "lid", "rid",
            F.round(
                F.col("dot").cast("double") / F.col("nl") / F.col("nr"), 9
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
