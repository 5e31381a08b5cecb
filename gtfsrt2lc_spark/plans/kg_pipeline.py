"""The end-to-end KG-construction pipeline (the engine's flagship plan).

Stages (SURVEY.md §7.1; reference analogs cited per stage):

  1. latest-wins page dedup            (history/differential analog, lib/Gtfsrt2LC.js:667-751)
  2. Arrow-UDF text extraction         (protobuf decode analog,      lib/Gtfsrt2LC.js:61-66)
  3. sentence split + SVO extraction   (pairwise connection forming, lib/Gtfsrt2LC.js:162-229)
  4. entity linking: broadcast exact + MinHash-LSH fuzzy
                                       (trip deduction,              lib/Gtfsrt2LC.js:323-394)
  5. connected-components canonicalization over sameAs edges
                                       (repair/unification pass,     lib/Gtfsrt2LC.js:438-665)
  6. IRI minting                       (URI templates,               lib/Utils.js:9-66)
  7. triple dedup + provenance         (12-quad explode,             lib/Connections2Triples.js:14-104)

Everything is declarative DataFrame ops except stage 2 (Arrow pandas UDF, the
sanctioned slow path). Joins against the KB are broadcast; the only wide
shuffles are the final triple dedup (keyed by (s,p,o)) and the window for
latest-wins (keyed by url) — both scale linearly with pages and are
AQE-skew-splittable (hot domains salt naturally through url hashing).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gtfsrt2lc_spark.functions.iri import entity_iri, predicate_iri
from gtfsrt2lc_spark.functions.text import extract_text_udf
from gtfsrt2lc_spark.operators.components import connected_components
from gtfsrt2lc_spark.operators.dedup import latest_by_key
from gtfsrt2lc_spark.operators.linking import link_fuzzy

# a "mention" is a capitalized token span; predicates are a fixed phrase lexicon
_MENTION = r"[A-Z][\w.]*(?: [A-Z][\w.]*)*"


class KGPipeline:
    """Holds the (small, broadcastable) KB sides and composes the plan.

    records:   (record_id, name, entity_type)
    surfaces:  (surface, record_id, prior)
    sameas:    (src, dst) record-equivalence edges
    predicates: phrase -> predicate local name
    """

    def __init__(
        self,
        records: DataFrame,
        surfaces: DataFrame,
        sameas: DataFrame,
        predicates: dict[str, str],
        fuzzy: bool = True,
        fuzzy_threshold: float = 0.5,
        max_local_surfaces: int | None = 1_000_000,
        scratch_dir: str | None = None,
    ) -> None:
        self.records = records
        self.surfaces = surfaces
        self.sameas = sameas
        self.predicates = predicates
        self.fuzzy = fuzzy
        self.fuzzy_threshold = fuzzy_threshold
        # Stage checkpoints MUST live on a filesystem every executor can
        # reach (HDFS/S3A/shared NFS): a driver-local tmp dir silently loses
        # the partitions other executors wrote on a multi-node cluster.
        # ``scratch_dir`` is any Hadoop-FS URI (run_incremental supplies an
        # out_dir-scoped one); the tempfile fallback is for local[*] only.
        self.scratch_dir = scratch_dir
        # linked() resolves the surface->record mapping driver-side while the
        # distinct surface set stays under this cap (the fast path: one tiny
        # LocalRelation broadcast, zero broadcast-subplan recomputation), and
        # falls back to a fully distributed mapping beyond it — at web scale
        # the distinct capitalized-span set grows with the corpus and must
        # never be collected. None = always local (tests/micro-batches).
        self.max_local_surfaces = max_local_surfaces
        self._canonical_map: DataFrame | None = None
        self._dict_local: dict[str, str] | None = None
        self._scratch: list[tuple[str, bool]] = []  # (path, via_hadoop_fs)
        self._stage_seq = 0
        self._spark = None
        phrases = sorted(predicates, key=len, reverse=True)
        alt = "|".join(re.escape(p) for p in phrases)
        self._svo_pattern = rf"^({_MENTION}) ({alt}) ({_MENTION})\.$"

    # ---- stage 1+2 -------------------------------------------------------
    def extracted(self, pages: DataFrame) -> DataFrame:
        """Latest snapshot per url, with deterministically extracted text.

        unique_order: (url, warc_ts) pairs are unique in a crawl log, so
        the latest-wins dedup is a duplicate-keys-only stats join over two
        pruned columns — the html payload never shuffles (the window form
        moved every page byte through the exchange, and the earlier
        all-keys winner semi-join silently degraded to the same payload
        shuffle once the winner set outgrew the broadcast threshold;
        measured as the pipeline's largest non-scaling I/O)."""
        latest = latest_by_key(pages, "url", "warc_ts", unique_order=True)
        return latest.withColumn("extracted_text", extract_text_udf(F.col("html")))

    # ---- stage 3 ---------------------------------------------------------
    def mentions(self, extracted: DataFrame) -> DataFrame:
        """(url, subj_surface, pred_phrase, obj_surface) candidate facts.

        Sentence split + anchored SVO regex, all JVM-side (regexp_extract).
        Carries ``part_id`` through when present (manifest mode)."""
        carry = ["url"] + (["part_id"] if "part_id" in extracted.columns else [])
        sent = extracted.select(
            *carry,
            F.explode(
                # newline = paragraph boundary; '. ' splits only when the
                # period is not an initial like "A." (abbreviation guard)
                F.split(
                    F.col("extracted_text"), r"\n|(?<=(?<![A-Z])[.!?])\s+(?=[A-Z])"
                )
            ).alias("sentence"),
        )
        p = self._svo_pattern
        # rlike-first: the anchored SVO pattern runs ONCE per sentence as a
        # boolean filter, and the three group extractions run only on the
        # (rare) matching sentences — the old shape evaluated regexp_extract
        # three times on EVERY sentence before filtering (3x the regex work
        # on a stream of ~hundreds of sentences per page). Equivalent rows:
        # regexp_extract and rlike both use find() on the same anchored
        # pattern, and every alternation branch of pred_phrase is non-empty,
        # so "pattern matches" == "group 2 extracted non-empty".
        svo = sent.where(F.col("sentence").rlike(p)).select(
            *carry,
            F.regexp_extract("sentence", p, 1).alias("subj_surface"),
            F.regexp_extract("sentence", p, 2).alias("pred_phrase"),
            F.regexp_extract("sentence", p, 3).alias("obj_surface"),
        )
        return svo

    # ---- stage 4 ---------------------------------------------------------
    def _resolved_dictionary(self) -> dict[str, str]:
        """surface -> best record_id, collected once (KB-sized by definition
        — the reference holds exactly this as an in-heap Map,
        lib/GtfsIndex.js:99-105)."""
        if self._dict_local is None:
            from gtfsrt2lc_spark.operators.linking import resolve_dictionary

            self._dict_local = {
                r["surface"]: r["record_id"]
                for r in resolve_dictionary(self.surfaces).collect()
            }
        return self._dict_local

    def surface_mapping_rows(
        self, mentions: DataFrame, surfs: list[str] | None = None
    ) -> list[tuple[str, str]]:
        """Resolve surface -> record_id ONCE over the distinct surfaces.

        The mention stream is huge; the distinct surface set is usually small
        (KB + noise), so it is collected and matched against the driver-side
        dictionary. The fuzzy MinHash-LSH pass runs only when unmatched
        surfaces exist, over LocalRelations — the same shape as the
        reference's grep pruning by updated-trip list
        (lib/GtfsIndex.js:107-118): heavy work only for keys that need it.
        Short-circuiting the all-exact case removes 2-3 Spark jobs from the
        pipeline's serial floor. ``linked()`` guards this path with
        ``max_local_surfaces`` and switches to a distributed mapping when
        the distinct set is too large to collect."""
        if surfs is None:
            surfs = [
                r["surface"]
                for r in mentions.select(
                    F.explode(F.array("subj_surface", "obj_surface")).alias("surface")
                )
                .distinct()
                .collect()
            ]
        dic = self._resolved_dictionary()
        mapped = [(s, dic[s]) for s in surfs if s in dic]
        unmatched = [s for s in surfs if s not in dic]
        if self.fuzzy and unmatched:
            spark = mentions.sparkSession
            q = spark.createDataFrame([(s,) for s in unmatched], "surface string")
            fz = link_fuzzy(
                q, self.surfaces, jaccard_threshold=self.fuzzy_threshold
            ).collect()
            mapped.extend((r["surface"], r["record_id"]) for r in fz)
        return mapped

    def surface_mapping(self, mentions: DataFrame) -> DataFrame:
        """DataFrame view of surface_mapping_rows (kept for API symmetry)."""
        return mentions.sparkSession.createDataFrame(
            self.surface_mapping_rows(mentions), "surface string, record_id string"
        )

    def linked(self, mentions: DataFrame) -> DataFrame:
        """Mentions with subject/object KB record ids; unlinkable rows drop
        (inner semantics, like the reference's silent skip on missing
        static data, lib/Gtfsrt2LC.js:98-111).

        The surface mapping is small by construction (distinct surfaces, not
        mentions), so it is COLLECTED to the driver and re-broadcast as a
        LocalRelation — the reference's in-heap MemStore posture
        (lib/GtfsIndex.js:99-105). This deliberately trades one extra pass
        over the mention stream for zero broadcast-subplan recomputation:
        measured at local[32], a lazily-persisted mentions cache racing the
        broadcast-exchange threads cost 4x wall clock (block-lock + unroll
        contention), while the two-pass local-mapping plan scales cleanly.
        The mention stream itself is STAGED TO PARQUET once and re-read by
        every consumer (mapping derivation consumes it up to three times:
        distinct surfaces, exact pass, fuzzy-unmatched branch). A parquet
        stage checkpoint is the contention-free materialization: in-memory
        persist suffers block-lock/unroll contention when broadcast-exchange
        threads race the main job (measured 4-25x CPU inflation at
        local[32]), while file scans are lock-free and exactly what a
        multi-executor cluster would do. See BENCH/BASELINE.md.

        When the distinct *unmatched* surface set exceeds
        ``max_local_surfaces`` the driver-side path is unsafe (web-scale
        corpora mint unbounded capitalized spans), so the mapping is built
        fully distributed: broadcast-dictionary exact join + MinHash-LSH
        fuzzy pass over the unmatched remainder, staged once and
        shuffle-joined to mentions.

        Serial-path job accounting (the scaling rule's fixed floor): the
        exact dictionary is already driver-local (KB-sized), so the mapping
        join needs NO distinct-surface probe job at all — exact matches ride
        the broadcast of the full dictionary, and the probe that remains
        collects only the distinct surfaces the dictionary does NOT cover
        (anti-join, usually empty or noise-sized). fuzzy=False therefore
        runs zero probe jobs (stage write + final join only), and fuzzy=True
        runs one probe whose collect volume is bounded by the unmatched set,
        not the full surface vocabulary — the previous shape collected every
        distinct surface to the driver and re-uploaded the matched subset.
        Further: the probe job is ELIDED entirely when the stage write
        proves it would be empty — the dictionary is driver-local, so an
        ``observe`` on the stage write counts surfaces outside it (JVM
        ``isin`` against the KB vocabulary, zero extra jobs), and the probe
        only runs when that count is non-zero (dirty corpora)."""
        spark = mentions.sparkSession
        dic_local = self._resolved_dictionary()
        obs = None
        if self.fuzzy:
            from pyspark.sql import Observation

            keys = list(dic_local)
            obs = Observation()
            miss = (
                (~F.col("subj_surface").isin(keys)).cast("long")
                + (~F.col("obj_surface").isin(keys)).cast("long")
            )
            mentions = mentions.observe(
                obs, F.sum(F.coalesce(miss, F.lit(1))).alias("miss")
            )
        mentions = self._stage(mentions)
        dict_df = spark.createDataFrame(
            list(dic_local.items()), "surface string, record_id string"
        )
        local: list[str] | None = None
        if not self.fuzzy:
            local = []  # exact-only: the dictionary IS the mapping, no probe
        elif not (obs.get["miss"] or 0):
            local = []  # stage write proved every surface is in the dictionary
        else:
            unmatched_df = (
                mentions.select(
                    F.explode(F.array("subj_surface", "obj_surface")).alias("surface")
                )
                .join(F.broadcast(dict_df.select("surface")), "surface", "left_anti")
                .distinct()
            )
            if self.max_local_surfaces is None:
                local = [r["surface"] for r in unmatched_df.collect()]
            else:
                # one job either way: the head IS the unmatched list when it
                # fits, and the size probe when it doesn't
                head = unmatched_df.limit(self.max_local_surfaces + 1).collect()
                if len(head) <= self.max_local_surfaces:
                    local = [r["surface"] for r in head]
        if local is not None:
            rows = list(dic_local.items())
            if local:
                fz = link_fuzzy(
                    spark.createDataFrame([(s,) for s in local], "surface string"),
                    self.surfaces,
                    jaccard_threshold=self.fuzzy_threshold,
                ).collect()
                rows.extend((r["surface"], r["record_id"]) for r in fz)
            mapping = F.broadcast(
                spark.createDataFrame(rows, "surface string, record_id string")
            )
        else:
            # unmatched set too large to collect: fuzzy-link it distributed
            # (banded MinHash-LSH, no all-pairs) and union with the exact
            # dictionary, which is KB-sized and already local either way.
            fz = link_fuzzy(
                unmatched_df, self.surfaces, jaccard_threshold=self.fuzzy_threshold
            ).select("surface", "record_id")
            mapping = self._stage(dict_df.unionByName(fz))
        m = mentions.join(
            mapping.withColumnRenamed("surface", "subj_surface").withColumnRenamed(
                "record_id", "subj_surface_record"
            ),
            "subj_surface",
        )
        m = m.join(
            mapping.withColumnRenamed("surface", "obj_surface").withColumnRenamed(
                "record_id", "obj_surface_record"
            ),
            "obj_surface",
        )
        return m

    def _stage(self, df: DataFrame) -> DataFrame:
        """Materialize an intermediate to a scratch parquet dir and re-read.

        The engine's stage-checkpoint primitive: truncates the plan, makes
        the intermediate consumable by any number of downstream subplans
        (including broadcast-exchange threads) without block-manager
        contention or recomputation.

        Cluster posture: when ``scratch_dir`` is set, stages go to
        ``<scratch_dir>/stage-NNNN`` through Spark's Hadoop-FS writer, so
        executors on any node write to (and the re-read scans) the same
        shared location — the same protocol as HistoryStore commits
        (plans/gtfs.py). The driver-local ``tempfile`` fallback exists only
        for local[*] sessions, where driver and executors share one
        filesystem."""
        spark = df.sparkSession
        self._spark = spark
        if self.scratch_dir is not None:
            self._stage_seq += 1
            path = f"{self.scratch_dir.rstrip('/')}/stage-{self._stage_seq:04d}"
            via_fs = True
        else:
            import tempfile

            path = tempfile.mkdtemp(prefix="kgstage_")
            via_fs = False
        self._scratch.append((path, via_fs))
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    def cleanup(self) -> None:
        """Remove scratch stage dirs created by linked().

        Hadoop-FS scratch paths delete through the FileSystem API (works on
        HDFS/S3A/local alike); tempfile fallbacks through shutil."""
        import shutil

        from gtfsrt2lc_spark.functions import hadoop_fs

        for path, via_fs in self._scratch:
            if via_fs and self._spark is not None:
                hadoop_fs.delete(self._spark, path)
            else:
                shutil.rmtree(path, ignore_errors=True)
        self._scratch.clear()

    # ---- stage 5+6 -------------------------------------------------------
    def canonical_map(self) -> DataFrame:
        """record_id -> (canonical_record, canonical IRI).

        Connected components over sameAs edges; component id = min record_id;
        IRI minted from the canonical record's name. Computed once per
        pipeline instance and cached (the KB is static across micro-batches —
        the reference's index-reuse pattern, README.md:58)."""
        if self._canonical_map is not None:
            return self._canonical_map
        cc = connected_components(self.sameas)
        recs = self.records.select("record_id", "name")
        mapped = (
            recs.join(cc, recs.record_id == cc.vertex, "left")
            .select(
                "record_id",
                F.coalesce(F.col("component"), F.col("record_id")).alias("canonical_record"),
            )
        )
        canon_names = recs.withColumnRenamed("record_id", "canonical_record").withColumnRenamed(
            "name", "canonical_name"
        )
        out = mapped.join(canon_names, "canonical_record").select(
            "record_id",
            "canonical_record",
            entity_iri(F.col("canonical_name")).alias("iri"),
        )
        # KB-sized by definition -> collect once, serve as a LocalRelation
        # (cheap to broadcast repeatedly; no distributed subplan re-runs)
        rows = [(r["record_id"], r["canonical_record"], r["iri"]) for r in out.collect()]
        self._canonical_map = self.records.sparkSession.createDataFrame(
            rows, "record_id string, canonical_record string, iri string"
        )
        return self._canonical_map

    # ---- stage 7 ---------------------------------------------------------
    def triples(self, pages: DataFrame, with_part: bool = False) -> DataFrame:
        """Deduplicated (subj, pred, obj, graph) — graph = min provenance url.

        with_part=True additionally carries ``part_id`` (for the checkpoint
        manifest) and dedups per (part, s, p, o)."""
        linked = self.linked(self.mentions(self.extracted(pages)))
        canon = F.broadcast(self.canonical_map())

        pred_map = F.create_map(
            *[F.lit(x) for kv in self.predicates.items() for x in kv]
        )
        t = (
            linked.join(
                canon.select(
                    F.col("record_id").alias("subj_surface_record"),
                    F.col("iri").alias("subj"),
                ),
                "subj_surface_record",
            )
            .join(
                canon.select(
                    F.col("record_id").alias("obj_surface_record"),
                    F.col("iri").alias("obj"),
                ),
                "obj_surface_record",
            )
            .withColumn("pred", predicate_iri(pred_map[F.col("pred_phrase")]))
        )
        keys = ["part_id", "subj", "pred", "obj"] if with_part else ["subj", "pred", "obj"]
        return t.groupBy(*keys).agg(F.min("url").alias("graph"))
