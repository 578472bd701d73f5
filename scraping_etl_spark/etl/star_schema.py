"""Star-schema builder: raw article documents → fact + dims + bridges.

Re-expresses the reference's core ETL (``DB/ETL.ipynb`` cells 23-45, raw
1040-1324): dims ``publishers/topics/dates/keywords/authors``, fact
``articles``, bridges ``author_article_map``/``keyword_article_map``.

Quirk policy (SURVEY §2.9) — defaults FIX, ``parity=True`` reproduces:

- Q1 (non-deterministic ``monotonically_increasing_id`` keys): fixed
  unconditionally — surrogate keys are ``xxhash64`` of the natural key,
  stable under repartitioning and re-runs (a nondeterministic ID cannot
  be reproduced even in parity mode; only *cardinalities* are parity-
  comparable, which the golden test checks).
- Q2 (authors ``distinct()`` after unique-ID assignment = no-op): fixed
  by deduplicating on the full identity (FullName, Country, University)
  BEFORE keying; ``parity=True`` keeps every exploded row.
- Q3 (bridge joins on FullName only → fan-out): fixed by joining the
  bridge on the full identity; ``parity=True`` joins on FullName.
- Q4 (keywords never deduplicated): fixed with ``distinct()`` before
  keying; ``parity=True`` keeps duplicates.
- Q7 (topics/dates built from the *uncleaned* frame while everything
  else uses the cleaned one): the builders take an explicit source
  DataFrame so the caller chooses; :func:`build_star` wires the cleaned
  frame by default and the raw frame under ``parity=True``.

Scale notes (100 TB): dims are distinct-projections (one partial-agg
shuffle each, output tiny); the fact build broadcasts all three dims
(J1); bridges shuffle on the explode key only when the dim is too big to
broadcast — at reference scale every dim broadcasts. ``xxhash64`` keys
need no global coordination (vs ``row_number``, which would serialize
through one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scraping_etl_spark.operators import cleaning as C

#: Identity columns of the authors dim (DB/Tables/authors.csv header).
AUTHOR_IDENTITY = ("FullName", "Country", "University")


def surrogate_key(*cols: str | Column) -> Column:
    """Deterministic surrogate key (SURVEY A3, fixing Q1): ``xxhash64``
    of the natural key — partition-independent, rerun-stable, collision
    probability ~n²/2⁶⁵ (negligible below ~10⁹ distinct keys)."""
    return F.xxhash64(*[F.col(c) if isinstance(c, str) else c for c in cols])


# ---------------------------------------------------------------------------
# Cleaning pass (ETL cells 13-26) — composition of operators/cleaning.py
# ---------------------------------------------------------------------------

def clean_documents(raw: DataFrame, parity: bool = False) -> DataFrame:
    """The reference's full cleaning chain in order (ETL cells 13-26):
    publisher sentinels → date sentinels → citations dropna → empty-array
    filters → drop Downloads/_id if present → country canonicalization →
    email filters → string scrub."""
    df = C.filter_publisher_sentinels(raw)
    df = C.filter_date_sentinels(df, parity=parity)
    df = C.drop_null_citations(df)
    df = C.filter_empty_arrays(df, ("authors_with_affiliations", "authors"))
    for junk in ("Downloads", "_id"):
        if junk in df.columns:
            df = df.drop(junk)
    df = C.canonicalize_countries(df)
    df = C.canonicalize_affiliation_countries(df)
    df = C.filter_email_countries(df, parity=parity)
    df = C.filter_email_affiliations(df)
    return C.scrub_string_columns(df)


# ---------------------------------------------------------------------------
# Dimensions
# ---------------------------------------------------------------------------

def build_publishers(clean: DataFrame, dedup_issn: bool = True) -> DataFrame:
    """Publishers dim (ETL cell 31, raw 1040-1044): nested projection +
    distinct. The reference keys articles→publishers on ISSN while the
    dim is distinct on all three columns, so one ISSN with two observed
    (Name, Quartile) pairs fans the fact join out; ``dedup_issn`` keeps
    one deterministic row per ISSN (min Name, then min Quartile)."""
    dim = clean.select(
        F.col("publisher.ISSN").alias("ISSN"),
        F.col("publisher.name").alias("Name"),
        F.col("publisher.Quartile").alias("Quartile"),
    ).distinct()
    if dedup_issn:
        from pyspark.sql import Window

        w = Window.partitionBy("ISSN").orderBy("Name", "Quartile")
        dim = (
            dim.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    return dim


def build_topics(source: DataFrame) -> DataFrame:
    """Topics dim (ETL cell 35, raw 1137-1140). Pass the cleaned frame
    for fixed semantics or the raw frame for Q7 parity."""
    return (
        source.select(F.col("topic").alias("Topic"))
        .distinct()
        .withColumn("TopicID", surrogate_key("Topic"))
        .select("TopicID", "Topic")
    )


def build_dates(source: DataFrame) -> DataFrame:
    """Dates dim (ETL cell 37, raw 1194-1200): distinct on the four raw
    date columns, plus a proper ``DateType`` derived via
    ``to_date(_, 'd MMMM yyyy')`` (SURVEY F3) — the reference carries
    only the pre-split string parts; the typed column is additive."""
    return (
        source.select(
            F.col("Date").alias("PublicationDate"),
            F.col("Day"),
            F.col("Month"),
            F.col("Year"),
        )
        .distinct()
        .withColumn("DateID", surrogate_key("PublicationDate", "Day", "Month", "Year"))
        .withColumn("DateValue", F.try_to_date("PublicationDate", "d MMMM yyyy"))
        .select("DateID", "PublicationDate", "Day", "Month", "Year", "DateValue")
    )


def build_keywords(clean: DataFrame, dedup: bool = True) -> DataFrame:
    """Keywords dim (ETL cell 33, raw 1095-1098): explode (the
    reference's one UDTF-shaped op, SURVEY §2.8) → key. ``dedup=True``
    fixes Q4 (reference ships 27,317 rows for 7,337 distinct strings);
    parity keeps every exploded row with a per-occurrence key."""
    exploded = clean.select(
        F.col("doi"), F.posexplode("keywords").alias("pos", "Keyword")
    )
    if dedup:
        return (
            exploded.select("Keyword")
            .distinct()
            .withColumn("KeywordID", surrogate_key("Keyword"))
            .select("KeywordID", "Keyword")
        )
    return exploded.withColumn(
        "KeywordID", surrogate_key("doi", "pos", "Keyword")
    ).select("KeywordID", "Keyword")


def build_authors(clean: DataFrame, dedup: bool = True) -> DataFrame:
    """Authors dim (ETL cell 39, raw 1221-1231): explode affiliations →
    project identity → key. ``dedup=True`` fixes Q2 (the reference's
    ``distinct()`` runs after unique-ID assignment and is a no-op; it
    ships 19,967 rows for 17,696 distinct identities)."""
    exploded = clean.select(
        F.col("doi"),
        F.posexplode("authors_with_affiliations").alias("pos", "aff"),
    ).select(
        "doi",
        "pos",
        F.col("aff.author").alias("FullName"),
        F.col("aff.country").alias("Country"),
        F.col("aff.university").alias("University"),
    )
    if dedup:
        return (
            exploded.select(*AUTHOR_IDENTITY)
            .distinct()
            .withColumn("AuthorID", surrogate_key(*AUTHOR_IDENTITY))
            .select("AuthorID", *AUTHOR_IDENTITY)
        )
    return exploded.withColumn(
        "AuthorID", surrogate_key("doi", "pos", *AUTHOR_IDENTITY)
    ).select("AuthorID", *AUTHOR_IDENTITY)


# ---------------------------------------------------------------------------
# Fact + bridges
# ---------------------------------------------------------------------------

def build_articles(
    clean: DataFrame,
    topics: DataFrame,
    dates: DataFrame,
    publishers: DataFrame,
) -> DataFrame:
    """Articles fact (ETL cell 41, raw 1247-1266): three chained left
    equi-joins to the dims (SURVEY J1). All dims are broadcast — at any
    realistic scale the dims are many orders smaller than the fact, so
    none of the three joins shuffles the fact."""
    base = clean.select(
        F.col("doi").alias("DOI"),
        F.col("title").alias("Title"),
        F.col("abstract").alias("Abstract"),
        F.col("citations").alias("Citations"),
        F.col("publisher.ISSN").alias("ISSN"),
        F.col("Date").alias("PublicationDate"),
        F.col("website").alias("Website"),
        F.col("topic").alias("Topic"),
    )
    return (
        base.join(F.broadcast(topics), "Topic", "left")
        .join(
            F.broadcast(dates.select("DateID", "PublicationDate")),
            "PublicationDate",
            "left",
        )
        .join(F.broadcast(publishers), "ISSN", "left")
        .select(
            "DOI", "Title", "Abstract", "Citations", "ISSN",
            "DateID", "Website", "TopicID",
        )
    )


def build_author_article_map(
    clean: DataFrame, authors: DataFrame, on_identity: bool = True
) -> DataFrame:
    """Author bridge (ETL cell 43, raw 1287-1299): explode + inner join
    back to the dim (SURVEY J2). ``on_identity=True`` fixes Q3 by
    joining on the full (FullName, Country, University) identity; parity
    joins on FullName only (the reference ships 42,595 bridge rows for
    3,502 DOIs because of the fan-out). Dim side broadcast."""
    exploded = clean.select(
        F.col("doi").alias("DOI"),
        F.explode("authors_with_affiliations").alias("aff"),
    ).select(
        "DOI",
        F.col("aff.author").alias("FullName"),
        F.col("aff.country").alias("Country"),
        F.col("aff.university").alias("University"),
    )
    keys = list(AUTHOR_IDENTITY) if on_identity else ["FullName"]
    return exploded.join(F.broadcast(authors), keys, "inner").select(
        "DOI", "AuthorID"
    )


def build_keyword_article_map(clean: DataFrame, keywords: DataFrame) -> DataFrame:
    """Keyword bridge (ETL cell 45, raw 1317-1324): explode + inner join
    on the keyword string (SURVEY J3). Dim side broadcast."""
    exploded = clean.select(
        F.col("doi").alias("DOI"), F.explode("keywords").alias("Keyword")
    )
    return exploded.join(F.broadcast(keywords), "Keyword", "inner").select(
        "DOI", "KeywordID"
    )


def build_star(
    raw: DataFrame, parity: bool = False, checkpoint_clean: bool = False
) -> dict[str, DataFrame]:
    """Full pipeline: clean + all eight output tables.

    ``parity=False`` (default): fixed semantics (Q2/Q3/Q4/Q5/Q7 repaired,
    deterministic keys). ``parity=True``: the reference's row-for-row
    cardinality behavior on the same input — dims keyed per occurrence,
    bridges joined on FullName, topics/dates from the uncleaned frame,
    date filter via subtract, dead email filter.

    ``checkpoint_clean=True`` materializes the shared cleaning lineage
    once (``localCheckpoint``) before the dim/fact fan-out, so a caller
    that consumes several outputs in one job pays one corpus scan
    instead of re-running the cleaning chain per branch. Default off:
    the production path (``materialize_star``) persists each table to
    parquet anyway, and single-output callers would pay an eager
    materialization for nothing. Values are identical either way.
    """
    clean = clean_documents(raw, parity=parity)
    if checkpoint_clean:
        clean = clean.localCheckpoint()
    dim_source = raw if parity else clean
    publishers = build_publishers(clean, dedup_issn=not parity)
    topics = build_topics(dim_source)
    dates = build_dates(dim_source)
    keywords = build_keywords(clean, dedup=not parity)
    authors = build_authors(clean, dedup=not parity)
    return {
        "clean": clean,
        "publishers": publishers,
        "topics": topics,
        "dates": dates,
        "keywords": keywords,
        "authors": authors,
        "articles": build_articles(clean, topics, dates, publishers),
        "author_article_map": build_author_article_map(
            clean, authors, on_identity=not parity
        ),
        "keyword_article_map": build_keyword_article_map(clean, keywords),
    }


#: Partitioning spec (SURVEY §4 physical notes / §7.7): the fact
#: partitions on the columns every analysis query filters by, so
#: partition pruning engages at 100 TB; dims/bridges are small or
#: key-uniform and stay unpartitioned.
FACT_PARTITION_COLS = ("Website", "TopicID")


def materialize_star(
    star: dict[str, DataFrame], out_dir: str, fmt: str = "parquet"
) -> dict[str, str]:
    """Write every star table under ``out_dir/<name>`` — the engine's
    twin of the reference's driver-side ``toPandas`` + ``to_csv`` export
    (DB/ETL.ipynb cells 50-54), kept fully distributed.

    The fact writes partitioned by :data:`FACT_PARTITION_COLS`
    (partition pruning for per-site / per-topic queries); everything
    else writes plain. Returns name → path."""
    paths: dict[str, str] = {}
    for name, df in star.items():
        if name == "clean":
            continue  # intermediate, not an output table
        path = f"{out_dir.rstrip('/')}/{name}"
        writer = df.write.mode("overwrite").format(fmt)
        if name == "articles":
            writer = writer.partitionBy(*FACT_PARTITION_COLS)
        writer.save(path)
        paths[name] = path
    return paths
