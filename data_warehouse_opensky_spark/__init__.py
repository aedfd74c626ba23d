"""PySpark-native analytics engine re-expressing the capabilities of the
reference `22130010/Data-Warehouse-opensky` pipeline (see SURVEY.md).

Layout:
    session    -- SparkSession builder/config helpers
    schemas    -- explicit StructType contracts (raw 17-col / clean 19-col)
    transform  -- reference-faithful clean transform (SURVEY §1.3)
    sources/   -- ingestion: OpenSky REST client, landing-zone readers
    operators/ -- as-of/latest-per-key, dedup family, similarity, text, multimodal
    functions/ -- reusable column expressions (strict bool, try casts, geo)
    plans/     -- the query catalog: every SURVEY §2 operator as a named query
    streaming/ -- Structured Streaming ingest + windowed analytics
    warehouse/ -- bronze/silver/gold zone ETL + control tables
"""

__version__ = "0.1.0"
