"""User-facing API facade — the reference's web-endpoint surface as plain
Python calls over a Spark-backed catalog.

A user of the reference interacts through the Flask endpoints documented
in ``docs/usage.rst``; this facade exposes the same operations 1:1 so a
client can switch by swapping HTTP calls for FastdbAPI calls (or by
mounting these methods behind any web framework — the engine itself stays
framework-free):

| reference endpoint                 | method here          |
|------------------------------------|----------------------|
| ``/ltcv/getmanyltcvs``             | ``get_many_ltcvs``   |
| ``/ltcv/getltcv``                  | ``get_ltcv``         |
| ``/ltcv/getrandomltcv``            | ``get_random_ltcv``  |
| ``/ltcv/gethottransients``         | ``get_hot_transients``|
| ``/ltcv/objectsearch``             | ``object_search``    |
| ``/count/<table>``                 | ``count``            |
| ``/db/runsqlquery``                | ``run_sql``          |
| ``/db/submitsqlquery``             | ``submit_sql_query`` |
| ``/db/checksqlquery/<id>``         | ``check_sql_query``  |
| ``/spectrum/askforspectrum`` etc.  | ``spectra_wanted``   |
| ``/getprocvers``                   | ``processing_versions``|

(reference ``src/webserver/ltcvapp.py``, ``dbapp.py``, ``server.py``,
``spectrumapp.py``; SURVEY.md §3)
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastdb_spark.catalog import Catalog
from fastdb_spark.operators.paginate import random_sample
from fastdb_spark.queries import ltcv as ltcv_q
from fastdb_spark.queries import objstats as objstats_q
from fastdb_spark.queries import search as search_q
from fastdb_spark.queries import spectrum as spectrum_q
from fastdb_spark.queries.counts import versioned_count
from fastdb_spark.streaming.queue import QueryQueue
from fastdb_spark.versions import ProcverResolver

CATALOG_TABLES = (
    "processing_version",
    "processing_version_alias",
    "base_processing_version",
    "base_procver_of_procver",
    "root_diaobject",
    "diaobject",
    "diaobject_position",
    "diasource",
    "diaforcedsource",
    "wantedspectra",
    "plannedspectra",
    "spectruminfo",
    "diasource_brokerinfo",
)


class FastdbAPI:
    """Query surface over one catalog directory (parquet tables named as
    in ``fastdb_spark.schemas``)."""

    def __init__(self, spark: SparkSession, catalog_root: str, queue_root: str | None = None):
        self.spark = spark
        self.catalog = Catalog(spark, catalog_root)
        self.tables = {
            t: self.catalog.table(t)
            for t in CATALOG_TABLES
            if self.catalog.exists(t)
        }
        self.resolver = ProcverResolver(
            self.tables["processing_version"],
            self.tables["processing_version_alias"],
            self.tables["base_procver_of_procver"],
        )
        self.queue = QueryQueue(spark, queue_root) if queue_root else None

    # -- version dimension (reference server.py /getprocvers) --------------

    def processing_versions(self) -> DataFrame:
        pv = self.tables["processing_version"].select("description")
        al = self.tables["processing_version_alias"].select("description")
        return pv.unionByName(al).distinct().orderBy("description")  # U1

    # -- lightcurves --------------------------------------------------------

    def get_many_ltcvs(
        self,
        processing_version: str,
        objids: list | None = None,
        which: str = "patch",
        bands: list[str] | None = None,
        mjd_now: float | None = None,
        nested: bool = False,
    ) -> DataFrame:
        ids_df = None
        if objids is not None:
            ids_df = self._normalize_objids(objids, processing_version)
        flat = ltcv_q.many_object_ltcvs(
            self.tables,
            self.resolver,
            processing_version,
            which=which,
            bands=bands,
            mjd_now=mjd_now,
            objids=ids_df,
        )
        return ltcv_q.assemble_nested(flat) if nested else flat

    def get_ltcv(self, processing_version: str, objid, **kw) -> DataFrame:
        return self.get_many_ltcvs(processing_version, [objid], **kw)

    def get_random_ltcv(self, processing_version: str, **kw) -> DataFrame:
        root = random_sample(self.tables["root_diaobject"].select("id"), 1)
        ids = [r["id"] for r in root.collect()]
        return self.get_many_ltcvs(processing_version, ids, **kw)

    def get_hot_transients(
        self, processing_version: str, detected_since_mjd: float, **kw
    ) -> DataFrame:
        return ltcv_q.get_hot_ltcvs(
            self.tables, self.resolver, processing_version, detected_since_mjd, **kw
        )

    def _normalize_objids(self, objids: list, processing_version: str) -> DataFrame:
        """ints -> diaobjectids, uuid strings -> rootids (reference
        ``src/ltcv.py:498-521``)."""
        ints = [int(o) for o in objids if not isinstance(o, str)]
        uuids = [str(o) for o in objids if isinstance(o, str)]
        if not ints and not uuids:
            # empty restriction -> empty result, not an error
            return self.spark.createDataFrame([], "rootid string")
        frames = []
        if uuids:
            frames.append(self.spark.createDataFrame([(u,) for u in uuids], ["rootid"]))
        if ints:
            ids = self.spark.createDataFrame([(i,) for i in ints], ["diaobjectid"])
            objmap = ltcv_q.resolve_objects(
                self.tables["diaobject"], self.resolver, processing_version
            )
            frames.append(objmap.join(ids, on="diaobjectid").select("rootid"))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f)
        return out.distinct()

    def get_object_infos(
        self, processing_version: str, objids: list | None = None
    ) -> DataFrame:
        ids_df = None
        if objids is not None:
            ids_df = self._normalize_objids(objids, processing_version)
        return ltcv_q.get_object_infos(
            self.tables, self.resolver, processing_version, objids=ids_df
        )

    # -- stats / search ------------------------------------------------------

    def build_objstats(self, processing_version: str):
        return objstats_q.build_objstats(self.tables, self.resolver, processing_version)

    def object_search(self, processing_version: str, **criteria: Any) -> DataFrame:
        per_band, _ = self.build_objstats(processing_version)
        ra = criteria.pop("ra", None)
        dec = criteria.pop("dec", None)
        radius = criteria.pop("radius_deg", None)
        return search_q.object_search(
            per_band,
            positions=self.tables["root_diaobject"],
            ra=ra,
            dec=dec,
            radius_deg=radius,
            **criteria,
        )

    def count(
        self, table: str, processing_version: str, estimate: bool = False
    ) -> int:
        keys = {
            "diasource": ("diaobjectid", "visit"),
            "diaforcedsource": ("diaobjectid", "visit"),
            "diaobject": ("diaobjectid",),
        }[table]
        row = versioned_count(
            self.tables[table], self.resolver, processing_version, table,
            keys=keys, estimate=estimate,
        ).collect()[0]
        return row["n"]

    # -- spectra -------------------------------------------------------------

    def spectra_wanted(self, **kw) -> DataFrame:
        return spectrum_q.spectra_wanted(
            self.tables["wantedspectra"],
            self.tables["plannedspectra"],
            self.tables["spectruminfo"],
            **kw,
        )

    # -- broker classifications (reference ltcvapp.py /ltcv/getbrokerinfo) ---

    def get_broker_info(
        self,
        diasourceids,
        processing_version: str = "realtime",
        brokername: str | None = None,
        topic: str | None = None,
    ) -> DataFrame:
        """Broker classification messages for a batch of source ids
        (reference ``src/webserver/ltcvapp.py:280-329``): restrict to the
        processing version's base versions, one row per (diasourceid,
        brokername, topic).  Where the reference's DISTINCT ON picks an
        arbitrary row among multiple matching base versions, this picks
        the highest-priority one (the A1 rule) — deterministic.  The
        version mapping uses the diasource table's entry (the reference
        joins the mapping without a table restriction)."""
        from fastdb_spark.operators.dedup import dedup_top_priority

        ids = (
            [int(x) for x in diasourceids]
            if isinstance(diasourceids, (list, tuple, set))
            else [int(diasourceids)]
        )
        b = self.tables["diasource_brokerinfo"].filter(
            F.col("diasourceid").isin(ids)
        )
        if brokername is not None:
            b = b.filter(F.col("brokername") == brokername)
        if topic is not None:
            b = b.filter(F.col("topic") == topic)
        mapping = self.resolver.bpv_mapping(processing_version, "diasource")
        joined = b.join(F.broadcast(mapping), on="base_procver_id", how="inner")
        out = dedup_top_priority(
            joined, ["diasourceid", "brokername", "topic"], ["priority"]
        )
        return out.select(
            "diasourceid", "brokername", "topic", "info"
        ).orderBy("diasourceid", "brokername", "topic")

    # -- raw SQL (reference dbapp.py /db/runsqlquery, S11) -------------------

    def register_views(self) -> None:
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)

    def run_sql(self, query: str, subdict: dict[str, Any] | None = None) -> DataFrame:
        """Short synchronous SQL over the registered catalog views.

        Read-only by construction: the only API on this path is a SELECT
        surface over temp views (the reference opens a read-only pg role).
        Named parameters use Spark's parameterized SQL (reference passes
        psycopg subdicts).
        """
        self.register_views()
        if subdict:
            return self.spark.sql(query, args=subdict)
        return self.spark.sql(query)

    def submit_sql_query(self, userid: str, queries: list[str], fmt: str = "csv") -> str:
        if self.queue is None:
            raise ValueError("no queue_root configured")
        self.register_views()
        return self.queue.submit(userid, queries, fmt=fmt)

    def check_sql_query(self, queryid: str):
        if self.queue is None:
            raise ValueError("no queue_root configured")
        row = self.queue.status(queryid)
        if row is None:
            return None
        state = (
            "error"
            if row["error"]
            else "finished"
            if row["finished"]
            else "started"
            if row["started"]
            else "queued"
        )
        return {"queryid": row["queryid"], "status": state, "errortext": row["errortext"]}
