"""Golden reconciliation against the reference's shipped outputs
(SURVEY §5.3): run the parity-mode star build on the reference's own
enriched article corpus and reconcile with `DB/Tables/*.csv`.

Scope caveat, verified against the snapshot: the ETL's true input,
``DB/Merged.json``, is a missing large blob (`.MISSING_LARGE_BLOBS`
lists it, alongside ``IEEE/IoT_upd.json`` and others), and the Mongo
collection it came from accumulated files not present in the snapshot
(``DB/MongoDB.py:25`` loads e.g. ``articles_iot.json``, absent). The
shipped ``*_upd.json`` files that DO exist hold 4,492 documents, while
the shipped CSVs imply a larger corpus (19,967 author rows, 3,502
distinct bridge DOIs). Absolute cardinalities are therefore not
derivable from the snapshot; what IS reproducible — and what this test
pins — is:

- the one input-complete dim: ``topics`` = exactly 6 rows, matching
  ``DB/Tables/topics.csv`` (AI, Big Data, Blockchain, Cryptography,
  DevOps, IoT);
- the quirk *signatures* the verdict's Q2/Q3/Q4/Q7 analysis predicts,
  parity vs fixed on the same input:
  Q4 — parity keywords keep every exploded occurrence (reference ships
       27,317 rows / 7,337 distinct); fixed dedups;
  Q2 — parity authors keep duplicate identities; fixed dedups on
       (FullName, Country, University);
  Q3 — parity bridge joins on FullName only and fans out past the
       exploded row count; fixed joins on full identity and matches it;
  Q7 — parity dates/topics derive from the *uncleaned* frame (superset
       of the cleaned one).
"""

from __future__ import annotations

import csv
import glob
import os

import pytest

from scraping_etl_spark import schemas
from scraping_etl_spark.etl.star_schema import build_star
from scraping_etl_spark.sources.readers import read_json_array

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not mounted"
)


def _upd_files():
    return sorted(
        glob.glob(f"{REF}/IEEE/*_upd.json")
        + glob.glob(f"{REF}/ScienceDirect/*_upd.json")
    )


@pytest.fixture(scope="module")
def stars(spark):
    # cache(): shared by 7 tests, and required for querying the
    # quarantine column (Spark disallows corrupt-record-only scans of
    # raw JSON; a cached parse is the documented workaround).
    raw = read_json_array(spark, _upd_files(), schemas.RAW_ARTICLES).cache()
    return {
        "raw": raw,
        "parity": build_star(raw, parity=True),
        "fixed": build_star(raw, parity=False),
    }


def _shipped_topics():
    with open(f"{REF}/DB/Tables/topics.csv", newline="", encoding="utf-8") as f:
        return sorted(row["Topic"] for row in csv.DictReader(f))


def test_corpus_loads_fully(stars):
    # 11 shipped *_upd files, 4,492 documents, none quarantined. (Spark
    # refuses corrupt-record-only queries on raw JSON, so reference a
    # data column alongside the quarantine column.)
    raw = stars["raw"]
    assert raw.count() == 4492
    bad = raw.select("doi", "_corrupt_record").filter(
        raw["_corrupt_record"].isNotNull()
    )
    assert bad.count() == 0


def test_topics_exact_match(stars):
    # The only dim whose input survives complete in the snapshot: every
    # topic string appears in the shipped corpus, so parity must match
    # DB/Tables/topics.csv row-for-row (6 topics).
    got = sorted(r["Topic"] for r in stars["parity"]["topics"].collect())
    assert got == _shipped_topics() == [
        "AI", "Big Data", "Blockchain", "Cryptography", "DevOps", "IoT",
    ]


def test_q4_keyword_dup_signature(stars):
    # Reference ships 27,317 keyword rows for 7,337 distinct strings
    # (~3.7x). Parity must preserve per-occurrence rows; fixed dedups.
    parity_n = stars["parity"]["keywords"].count()
    fixed_n = stars["fixed"]["keywords"].count()
    distinct_n = (
        stars["parity"]["keywords"].select("Keyword").distinct().count()
    )
    assert fixed_n == distinct_n
    assert parity_n > 2 * fixed_n  # heavy duplication, as shipped


def test_q2_author_dup_signature(stars):
    # Reference ships 19,967 author rows, 17,696 distinct identities.
    parity_n = stars["parity"]["authors"].count()
    fixed_n = stars["fixed"]["authors"].count()
    assert parity_n > fixed_n  # duplicates persist in parity
    ident = stars["fixed"]["authors"].select(
        "FullName", "Country", "University"
    )
    assert ident.distinct().count() == fixed_n  # fixed = keyed identity


def test_q3_bridge_fanout_signature(stars):
    # Parity bridge joins on FullName only: one name with k duplicate
    # AuthorIDs yields k rows per article occurrence (reference: 42,595
    # bridge rows > 19,967 author rows). Fixed joins on full identity,
    # so the bridge equals the exploded affiliation count exactly.
    # NOTE: each mode is compared against its OWN cleaned frame — the
    # parity date filter uses `subtract` (EXCEPT has set semantics, so
    # it also drops duplicate documents), so the two cleans differ.
    from pyspark.sql import functions as F

    def exploded_n(mode):
        return (
            stars[mode]["clean"]
            .select(F.explode("authors_with_affiliations"))
            .count()
        )

    assert stars["parity"]["author_article_map"].count() > exploded_n("parity")
    assert stars["fixed"]["author_article_map"].count() == exploded_n("fixed")


def test_q7_dim_source_signature(stars):
    # Parity topics/dates derive from the raw frame, fixed from the
    # cleaned frame — raw is a superset, so parity dims are >= fixed.
    assert (
        stars["parity"]["dates"].count() >= stars["fixed"]["dates"].count()
    )


def test_parity_fact_doi_coverage(stars):
    # Every cleaned document lands in the fact exactly once under fixed
    # semantics (left joins cannot drop or duplicate: dims are keyed).
    # DOIs are NOT distinct in the corpus — the same article appears
    # under multiple scraped topics — so only row-preservation is
    # asserted, not DOI uniqueness.
    clean_n = stars["fixed"]["clean"].count()
    fact = stars["fixed"]["articles"]
    assert fact.count() == clean_n
    assert fact.select("DOI").distinct().count() <= clean_n
