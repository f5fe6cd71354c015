"""Property-graph construction as two DataFrames (nodes, edges).

Reference materializes Artist/Release/Genre/Country nodes and
PLAYS_GENRE / SIMILAR_TO / FROM_COUNTRY / PERFORMED_BY / SUBGENRE_OF
edges into Neo4j via batched Cypher (ingest_graph_db.py:126-296).
Our canonical graph is Parquet ``nodes(id,label,…)`` / ``edges(src,dst,
rel)`` tables — idempotent overwrite replaces the reference's
clear-and-reload (utils/neo4j_helpers.py:103-189); downstream systems
(Neo4j, GraphFrames) are sinks, not the source of truth.

All edge builders are hash joins; at scale, bucket nodes and edges by
id so multi-hop traversals co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import name_or_alias_join
from ..operators.relational import positioned_rollup, union_relaxed


def build_graph_tables(
    artists: DataFrame,
    genres: DataFrame,
    countries: DataFrame,
    releases: DataFrame,
    tracks: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Entity tables → (nodes, edges). Mirrors the five edge types of
    ingest_graph_db.py:126-296, each as a declarative join:

    - PLAYS_GENRE:   explode(artists.genres) ⋈ genres.id
    - SIMILAR_TO:    name-or-alias resolution (theta join decomposed)
    - FROM_COUNTRY:  artists.country = countries.name
    - PERFORMED_BY:  releases.artist_id ⋈ artists.id
    - SUBGENRE_OF:   explode(genres.parent_ids) self-join
    """
    tracklists = positioned_rollup(
        tracks.filter(F.col("album_id").isNotNull()),
        group_col="album_id",
        order_col="id",
        entry_col=F.col("title"),
        out_col="tracks",
    )
    release_nodes = (
        releases.join(tracklists, releases["id"] == tracklists["album_id"], "left")
        .drop("album_id")
        .select(
            "id",
            F.lit("Release").alias("label"),
            F.col("title"),
            F.col("year"),
            F.col("tracks"),
        )
    )
    artist_nodes = artists.select(
        "id", F.lit("Artist").alias("label"), "name", "aliases", "mbid"
    )
    genre_nodes = genres.select(
        "id", F.lit("Genre").alias("label"), "name", "aliases"
    )
    country_nodes = countries.select(
        "id", F.lit("Country").alias("label"), "name", "aliases"
    )
    nodes = union_relaxed(artist_nodes, genre_nodes, country_nodes, release_nodes)

    plays_genre = (
        artists.select(
            F.col("id").alias("src"),
            F.explode(F.coalesce("genres", F.array())).alias("gid"),
        )
        .join(
            genres.select(F.col("id").alias("gid")).distinct(),
            "gid",
            "left_semi",
        )
        .select("src", F.col("gid").alias("dst"), F.lit("PLAYS_GENRE").alias("rel"))
    )
    similar_to = (
        artists.select(
            F.col("id"),
            F.explode(F.coalesce("similar_artists", F.array())).alias("name"),
        )
        .join(
            artists.select(F.col("id").alias("dst"), "name", "aliases"),
            "name",
            "inner",
        )
        .filter(F.col("id") != F.col("dst"))
        .select(
            F.col("id").alias("src"), "dst", F.lit("SIMILAR_TO").alias("rel")
        )
        .unionByName(
            _similar_by_alias(artists)
        )
        .distinct()
    )
    from_country = (
        artists.filter(F.col("country").isNotNull())
        .select(F.col("id").alias("src"), F.col("country").alias("name"))
        .join(countries.select(F.col("id").alias("dst"), "name"), "name")
        .select("src", "dst", F.lit("FROM_COUNTRY").alias("rel"))
    )
    performed_by = (
        releases.filter(F.col("artist_id").isNotNull())
        .select(F.col("id").alias("src"), F.col("artist_id").alias("dst"))
        .join(artists.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select("src", "dst", F.lit("PERFORMED_BY").alias("rel"))
    )
    subgenre_of = (
        genres.select(
            F.col("id").alias("src"),
            F.explode(F.coalesce("parent_ids", F.array())).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .join(genres.select(F.col("id").alias("dst")), "dst", "left_semi")
        .select("src", "dst", F.lit("SUBGENRE_OF").alias("rel"))
    )
    edges = (
        plays_genre.unionByName(similar_to)
        .unionByName(from_country)
        .unionByName(performed_by)
        .unionByName(subgenre_of)
    )
    return nodes, edges


def _similar_by_alias(artists: DataFrame) -> DataFrame:
    """similar_artists names matched against target aliases
    (the OR branch of the reference theta join,
    ingest_graph_db.py:236-243)."""
    return name_or_alias_join(
        artists.select(
            "id",
            F.explode(F.coalesce("similar_artists", F.array())).alias("sim"),
        ).select("id", F.col("sim").alias("name")),
        artists,
        left_name_col="name",
        right_name_col="name",
        right_alias_col="aliases",
    ).select("src", "dst", F.lit("SIMILAR_TO").alias("rel"))


def validate_edges(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Drop edges whose endpoints are unknown — two semi-joins
    (reference: igraph build drops unknown-endpoint edges,
    utils/neo4j_helpers.py:206-228)."""
    ids = nodes.select(F.col("id")).distinct()
    return (
        edges.join(ids.withColumnRenamed("id", "src"), "src", "left_semi")
        .join(ids.withColumnRenamed("id", "dst"), "dst", "left_semi")
    )
