"""Host-galaxy import: port external catalog hosts and object↔host links.

The reference's ``DRImporter.import_host_info`` (reference
``src/services/dr_importer.py:37-110``) backfills host galaxies a data
release refers to but the catalog doesn't know yet: an anti-join finds the
missing hosts (SURVEY.md J4), they are copied in from the external source,
and object rows are linked to the host ids.  That code targets the
pre-2026-02 schema (``nearbyextobj{1..3}`` columns on diaobject); the
refactor (reference ``db/2026-02-02_refactor.sql:113-167,230-246``) moved
host identity to ``host_galaxy(host_catalog, host_id)`` and the links to
``diaobject_host_match(diaobjectid, host_galaxy_id, base_procver_id,
prio)`` — this module implements the operation against the NEW model.

Spark shape: the anti-join ships only (host_catalog, host_id) pairs; new
host ids are md5-deterministic (re-running a failed import mints the same
ids — idempotent under the at-least-once driver, same trick as the ingest
root association); both writes are DO-NOTHING upserts, so the whole import
is safe to re-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fastdb_spark.storage import ParquetTable


def _host_uuid(catalog_col, id_col, bpv_col):
    """Deterministic uuid-shaped host id from the natural key."""
    h = F.md5(
        F.concat_ws("\x1f", F.lit("host"), catalog_col, id_col, bpv_col)
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def import_host_matches(
    candidates: DataFrame,
    host_galaxy: ParquetTable,
    host_match: ParquetTable,
    base_procver_id: str,
) -> tuple[int, int]:
    """Backfill hosts + object links from an external candidate set.

    ``candidates``: one row per (object, candidate host) —
    ``diaobjectid, host_catalog, host_id, ra, dec, info, prio``
    (prio 0 = best match, as in ``diaobject_host_match.prio``).

    Steps (reference dr_importer semantics on the post-refactor model):

    1. distinct candidate hosts anti-joined against ``host_galaxy`` on the
       natural key ``(host_catalog, host_id)`` within the base version —
       the "temp_missing_hosts" step, J4;
    2. missing hosts inserted with deterministic ids (DO NOTHING upsert);
    3. every candidate link resolved to its host id and upserted into
       ``diaobject_host_match`` on the full PK (DO NOTHING).

    Returns ``(n_new_hosts, n_links_written)``.
    """
    bpv = F.lit(base_procver_id)
    cand = candidates.withColumn("base_procver_id", bpv)

    hosts = cand.select(
        "host_catalog", "host_id", "base_procver_id", "ra", "dec", "info"
    ).dropDuplicates(["host_catalog", "host_id"])
    if host_galaxy.exists():
        known = host_galaxy.read().filter(
            F.col("base_procver_id") == base_procver_id
        ).select("host_catalog", "host_id")
        missing = hosts.join(known, ["host_catalog", "host_id"], "left_anti")
    else:
        missing = hosts
    new_hosts = missing.select(
        _host_uuid(
            F.col("host_catalog"), F.col("host_id"), F.col("base_procver_id")
        ).alias("id"),
        "host_catalog",
        "host_id",
        "base_procver_id",
        "ra",
        "dec",
        "info",
    )
    n_new = new_hosts.count()
    if n_new:
        host_galaxy.upsert(new_hosts, ["id"], on_conflict="nothing")

    links = cand.select(
        "diaobjectid",
        _host_uuid(
            F.col("host_catalog"), F.col("host_id"), F.col("base_procver_id")
        ).alias("host_galaxy_id"),
        "base_procver_id",
        F.col("prio").cast("short").alias("prio"),
    ).dropDuplicates(["diaobjectid", "host_galaxy_id", "base_procver_id"])
    n_links = links.count()
    if n_links:
        host_match.upsert(
            links,
            ["diaobjectid", "host_galaxy_id", "base_procver_id"],
            on_conflict="nothing",
        )
    return n_new, n_links


def best_host_per_object(host_match: DataFrame, host_galaxy: DataFrame) -> DataFrame:
    """The prio-0-wins host per object (lowest prio = best candidate),
    joined to host identity — the read-side companion query
    (``diaobject_host_match.prio`` semantics, reference
    ``db/2026-02-02_refactor.sql:150-167``)."""
    from fastdb_spark.operators.dedup import dedup_first_seen

    best = dedup_first_seen(
        host_match,
        ["diaobjectid", "base_procver_id"],
        ["prio", "host_galaxy_id"],
    )
    hg = host_galaxy.select(
        F.col("id").alias("host_galaxy_id"),
        "host_catalog",
        "host_id",
        F.col("ra").alias("host_ra"),
        F.col("dec").alias("host_dec"),
    )
    return best.join(F.broadcast(hg), on="host_galaxy_id", how="left")
