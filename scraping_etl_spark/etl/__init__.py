"""Document→star-schema ETL — the reference's core deliverable
(DB/ETL.ipynb cells 23-45) as a library of DataFrame builders."""

from scraping_etl_spark.etl.star_schema import (  # noqa: F401
    build_articles,
    build_author_article_map,
    build_authors,
    build_dates,
    build_keyword_article_map,
    build_keywords,
    build_publishers,
    build_star,
    build_topics,
    clean_documents,
    surrogate_key,
)
