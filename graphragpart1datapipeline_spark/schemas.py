"""Declared StructType schemas for every engine entity.

Mirrors the reference's auto-derived model schemas
(reference: src/data_pipeline/models.py:16-202 — msgspec Structs with
Optional fields → all-nullable columns). The engine NEVER relies on
schema inference for its own tables (reference mandates declared schemas,
models.py:180-202); inference is allowed only for ad-hoc exploration.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


S = StringType()
L = LongType()
D = DoubleType()
ARR_S = ArrayType(StringType())


# --- Entity tables (reference models.py:16-65) -------------------------------

ARTIST_INDEX = StructType([
    _f("artist_uri", S), _f("name", S), _f("start_date", S),
])

ARTISTS = StructType([
    _f("id", S), _f("name", S), _f("mbid", S), _f("country", S),
    _f("aliases", ARR_S), _f("genres", ARR_S), _f("tags", ARR_S),
    _f("similar_artists", ARR_S),
])

GENRES = StructType([
    _f("id", S), _f("name", S), _f("aliases", ARR_S), _f("parent_ids", ARR_S),
])

RELEASES = StructType([
    _f("id", S), _f("title", S), _f("year", L), _f("artist_id", S),
])

TRACKS = StructType([
    _f("id", S), _f("title", S), _f("album_id", S),
])

COUNTRIES = StructType([
    _f("id", S), _f("name", S), _f("aliases", ARR_S),
])

# --- Article / chunk table (reference models.py:68-97) -----------------------

ARTICLE_METADATA = StructType([
    _f("title", S), _f("name", S), _f("entity_type", S),
    _f("aliases", ARR_S), _f("tags", ARR_S), _f("similar_artists", ARR_S),
    _f("genres", ARR_S), _f("inception_year", L), _f("country", S),
    _f("wikipedia_url", S), _f("wikidata_uri", S),
    _f("chunk_index", L), _f("total_chunks", L),
])

ARTICLES = StructType([
    _f("id", S), _f("article", S), _f("metadata", ARTICLE_METADATA),
])

# --- Community tables (reference models.py:104-134) --------------------------

COMMUNITY_ASSIGNMENTS = StructType([
    _f("artist_id", S), _f("artist_name", S),
    _f("community_L0", L), _f("community_L1", L), _f("community_L2", L),
])

COMMUNITIES = StructType([
    _f("community_id", L), _f("level", L), _f("entity_type", S),
    _f("member_count", L), _f("top_tags", ARR_S), _f("top_genres", ARR_S),
    _f("top_countries", ARR_S), _f("representative_artists", ARR_S),
    _f("member_ids", ARR_S), _f("name", S), _f("summary", S),
])

# --- Graph tables (our canonical property-graph representation) --------------
# Reference materializes the graph in Neo4j (ingest_graph_db.py:126-296);
# the engine's canonical form is two DataFrames, sparse per label.

NODES = StructType([
    _f("id", S), _f("label", S), _f("name", S), _f("aliases", ARR_S),
    _f("mbid", S), _f("title", S), _f("year", L), _f("tracks", ARR_S),
])

EDGES = StructType([
    _f("src", S), _f("dst", S), _f("rel", S),
])

# --- Vector store (chunks with embeddings) -----------------------------------
# Reference: ChromaDB collection (chroma_helpers.py:111-124); here a table.

CHUNKS = StructType([
    _f("id", S), _f("text", S),
    _f("embedding", ArrayType(FloatType())),
    _f("metadata", ARTICLE_METADATA),
])

# --- Multimodal assets (extension surface; payloads are opaque binary) -------

MEDIA_ASSETS = StructType([
    _f("asset_id", S), _f("kind", S),          # "image" | "audio" | "video"
    _f("payload", BinaryType()),
    _f("mime_type", S), _f("width", L), _f("height", L),
    _f("duration_ms", L), _f("sample_rate", L),
])

# --- Synthetic test tables (driver-generated, TESTDATA.md) -------------------

EVENTS = StructType([
    _f("event_id", L), _f("ts", TimestampType()), _f("user_id", L),
    _f("event_type", S), _f("value", D), _f("props", S),
])

DOCUMENTS = StructType([
    _f("doc_id", L), _f("text", S), _f("lang", S), _f("source", S),
    _f("n_chars", L),
])

EMBEDDINGS = StructType([
    _f("vec_id", L), _f("embedding", ArrayType(FloatType())), _f("label", L),
])
