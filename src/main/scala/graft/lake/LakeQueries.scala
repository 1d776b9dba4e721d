package graft.lake

import graft.core.{QueryPack, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Driver-checkable queries for the versioned-lake layout layer:
  * Z-order clustering + manifest file-stats skipping. Both queries
  * rebuild a clustered versioned copy of `orders` in a scratch root and
  * answer FROM the rebuilt table, so a hash-match against DuckDB over
  * the RAW table proves the whole layout loop — cluster → publish →
  * stats → prune → read — loses nothing and invents nothing.
  *
  * Scratch roots are deterministic per input dir (publish+vacuum keeps
  * them at `keepVersions` versions across repeated bench runs, so they
  * never accumulate), and live under java.io.tmpdir — the queries never
  * write inside the test-data directory.
  */
object LakeQueries extends QueryPack {

  private val dec = DecimalType(18, 2)

  private def scratch(tag: String, dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"${System.getProperty("java.io.tmpdir")}/graft_lakeq/$tag$safe/t"
  }

  override def queries: Map[String, Q] = Map(
    // Generic relational keyed diff (the snapshotDiff idea without a
    // text fingerprint): null-safe struct comparison classifies every
    // order key across two deterministic snapshot variants.
    "q_l_keyed_diff" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val oldDf = o.where(col("o_orderkey") % 10 =!= 0)
      val newDf = o.where(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") + 1.0)
            .otherwise(col("o_totalprice")))
      LakeStorage.keyedDiff(oldDf, newDf, Seq("o_orderkey"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"))
        .orderBy("status")
    }),

    // Data-skipping scan: orders Z-ordered on (o_custkey, o_totalprice)
    // with per-file stats, then a 2-D range read that prunes files on
    // BOTH dimensions before re-applying the exact predicate. The
    // oracle filters the raw table directly — identical results prove
    // pruning is sound (skipping never drops a matching row).
    "q_l_skip_scan" -> ((s, dir) => {
      val root = scratch("skip", dir)
      Clustering.publishClustered(Tables.orders(s, dir), root,
        Seq("o_custkey", "o_totalprice"), numFiles = 16, bits = 8)
      VersionedTable.readCurrentWhere(s, root, Seq(
          VersionedTable.ColRange("o_custkey", Some(100L), Some(2000L)),
          VersionedTable.ColRange("o_totalprice", Some(50000.0), Some(200000.0))))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    }),

    // Bloom file-index point lookup: customer hash-clustered on
    // c_custkey (so every file spans nearly the whole c_name range and
    // min/max stats prune NOTHING — the adversarial layout for range
    // skipping), with a per-file Bloom on c_name. The ColEquals probe
    // prunes to the file(s) that might hold the key; the oracle is the
    // raw-table point filter — identical results prove the Bloom path
    // never loses the matching row.
    "q_l_bloom_lookup" -> ((s, dir) => {
      val root = scratch("bloom", dir)
      VersionedTable.publish(
        Tables.customer(s, dir).repartition(8, col("c_custkey")),
        root, statsColumns = Seq("c_custkey"), bloomColumns = Seq("c_name"),
        bloomExpectedItems = 20000L, bloomFpp = 0.001)
      VersionedTable.readCurrentWhere(s, root,
          Seq(VersionedTable.ColEquals("c_name", "Customer#000000042")))
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Batch point lookup (IN-list): same adversarial hash layout as
    // the bloom lookup, three keys of which one is absent at every
    // scale factor — the kept file set is the union of each key's
    // bloom candidates, and the oracle is the raw-table IN filter.
    "q_l_in_lookup" -> ((s, dir) => {
      val root = scratch("in", dir)
      VersionedTable.publish(
        Tables.customer(s, dir).repartition(8, col("c_custkey")),
        root, statsColumns = Seq("c_custkey"), bloomColumns = Seq("c_name"),
        bloomExpectedItems = 20000L, bloomFpp = 0.001)
      VersionedTable.readCurrentWhere(s, root,
          Seq(VersionedTable.ColIn("c_name", Seq(
            "Customer#000000042", "Customer#000000777", "Customer#999999999"))))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    }),

    // Merge-on-read upsert: base snapshot + two keyed delta batches,
    // read through the newest-wins merged view. The oracle emulates
    // the same precedence in SQL (d2 over d1 over base via anti-IN) —
    // hash-matching proves the delta overlay semantics exactly.
    "q_l_mor_merge" -> ((s, dir) => {
      val root = scratch("mor", dir)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      VersionedTable.publish(orders, root)
      // the fresh publish supersedes prior runs' deltas; with nothing
      // pending this is the cheap no-fold cleanup that only deletes
      // delta dirs older than the retention horizon
      VersionedTable.compactDeltas(s, root, Seq("k"))
      VersionedTable.appendDelta(
        orders.where(col("k") % 10 === 0).withColumn("p", col("p") * 2), root)
      VersionedTable.appendDelta(
        orders.where(col("k") % 15 === 0).withColumn("p", col("p") * 3), root)
      VersionedTable.readCurrentMerged(s, root, Seq("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(dec)).cast("double").as("sum_p"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // Merge-on-read DELETE: base + upsert delta + tombstone delta +
    // later upsert delta, so precedence exercises every composition —
    // delete over upsert, upsert over delete (re-insert), delete of
    // untouched base rows. The oracle emulates newest-wins precedence
    // (d3 > del > d1 > base) in SQL — hash-matching proves tombstone
    // merge semantics exactly, including that deletes never leak the
    // reserved flag column into the result.
    "q_l_mor_delete" -> ((s, dir) => {
      val root = scratch("mordel", dir)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      VersionedTable.publish(orders, root)
      // no-fold cleanup of prior runs' superseded deltas (see q_l_mor_merge)
      VersionedTable.compactDeltas(s, root, Seq("k"))
      VersionedTable.appendDelta(
        orders.where(col("k") % 10 === 0).withColumn("p", col("p") * 2), root)
      VersionedTable.appendDeleteDelta(
        orders.where(col("k") % 7 === 0).select("k"), root)
      VersionedTable.appendDelta(
        orders.where(col("k") % 15 === 0).withColumn("p", col("p") * 3), root)
      VersionedTable.readCurrentMerged(s, root, Seq("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(dec)).cast("double").as("sum_p"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // Pruned read THROUGH the delta overlay: base clustered+stats'd on
    // customer key, then upsert and delete deltas land, then a range
    // read that skips base files while the un-pruned overlay still
    // overrides and deletes. The oracle applies the same precedence
    // then the range filter on the raw table — hash-matching proves
    // base-file skipping under an overlay never loses an override, a
    // tombstone, or a matching row.
    "q_l_mor_skip" -> ((s, dir) => {
      val root = scratch("morskip", dir)
      val orders = Tables.orders(s, dir).select(
        col("o_orderkey").as("k"), col("o_custkey").as("c"),
        col("o_totalprice").as("p"))
      Clustering.publishClustered(orders, root, Seq("c"), numFiles = 16,
        bits = 8)
      // no-fold cleanup of prior runs' superseded deltas (see q_l_mor_merge)
      VersionedTable.compactDeltas(s, root, Seq("k"))
      VersionedTable.appendDelta(
        orders.where(col("k") % 10 === 0).withColumn("p", col("p") * 2), root)
      VersionedTable.appendDeleteDelta(
        orders.where(col("k") % 7 === 0).select("k"), root)
      VersionedTable.readCurrentMergedWhere(s, root, Seq("k"),
          Seq(VersionedTable.ColRange("c", Some(100L), Some(2000L))))
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(dec)).cast("double").as("sum_p"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // Schema evolution through the delta overlay: a delta carrying a
    // column the base lacks widens the merged view (base rows read
    // null). The oracle builds the same union schema in SQL.
    "q_l_schema_evo" -> ((s, dir) => {
      val root = scratch("evo", dir)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      VersionedTable.publish(orders, root)
      // no-fold cleanup of prior runs' superseded deltas (see q_l_mor_merge)
      VersionedTable.compactDeltas(s, root, Seq("k"))
      VersionedTable.appendDelta(
        orders.where(col("k") % 10 === 0)
          .withColumn("p", col("p") * 2).withColumn("tag", lit("hot")), root)
      VersionedTable.readCurrentMerged(s, root, Seq("k"))
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(dec)).cast("double").as("sum_p"),
          count(col("tag")).as("n_tag"),
          count(when(col("tag").isNull, 1)).as("n_untag"))
    }),

    // Version rollback: publish good data, publish a corrupted version,
    // roll back to the good one — the current read matches the raw
    // table exactly (and the rollback's timestamp supersedes any
    // pending overlay). Oracle is the plain raw-table aggregate.
    "q_l_rollback" -> ((s, dir) => {
      val root = scratch("rollback", dir)
      val orders = Tables.orders(s, dir)
        .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
      val good = VersionedTable.publish(orders, root)
      VersionedTable.publish(orders.withColumn("p", col("p") * 2), root)
      VersionedTable.rollbackTo(s, root, good)
      VersionedTable.readCurrent(s, root)
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(dec)).cast("double").as("sum_p"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
    }),

    // Cross-table consistent snapshot: fact+dim committed as one group
    // manifest; afterwards the fact's own current is advanced with a
    // zeroed-out publish (the torn mid-group state). Group readers
    // resolve the PINNED versions, so the join matches the raw tables
    // — proving the snapshot shields readers from per-table drift.
    "q_l_snapshot_join" -> ((s, dir) => {
      val group = scratch("snap", dir)
      val fact = Tables.orders(s, dir).select(
        col("o_orderkey").as("k"), col("o_custkey").as("c"),
        col("o_totalprice").as("p"))
      val dim = Tables.customer(s, dir)
        .select(col("c_custkey").as("c"), col("c_mktsegment").as("seg"))
      // 2 fact publishes per snapshot interval × 3 kept snapshots →
      // keep 7 on EVERY publish of the member (group and direct alike)
      // so each retained manifest's pin stays readable
      // (SnapshotGroup scaladoc sizing rule)
      SnapshotGroup.publishSnapshot(s, group,
        Seq("fact" -> fact, "dim" -> dim), keepVersions = 7)
      VersionedTable.publish(fact.withColumn("p", lit(0.0)), s"$group/fact",
        keepVersions = 7)
      SnapshotGroup.readSnapshot(s, group, "fact")
        .join(SnapshotGroup.readSnapshot(s, group, "dim"), "c")
        .groupBy("seg")
        .agg(count(lit(1)).as("n"),
          sum(col("p").cast(dec)).cast("double").as("sum_p"))
        .orderBy("seg")
    }),

    // Clustering round trip: the full read-back of the Z-ordered
    // versioned copy aggregates identically to the raw table — the
    // layout op (two equi-depth ntiles, Morton interleave, range
    // repartition, helper-column drop) is row-lossless and exact.
    "q_l_cluster_roundtrip" -> ((s, dir) => {
      val root = scratch("rt", dir)
      Clustering.publishClustered(Tables.orders(s, dir), root,
        Seq("o_custkey", "o_totalprice"), numFiles = 8, bits = 8)
      VersionedTable.readCurrent(s, root)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).cast("double").as("sum_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .orderBy("o_orderstatus")
    }),
  )

  override def oracle: Map[String, String] = Map(
    // IS NOT DISTINCT FROM per column = the engine's null-safe struct
    // equality.
    "q_l_keyed_diff" ->
      """WITH o1 AS (SELECT * FROM orders WHERE o_orderkey % 10 <> 0),
        |o2 AS (SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |d AS (SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS k,
        |    CASE WHEN a.o_orderkey IS NULL THEN 'added'
        |         WHEN b.o_orderkey IS NULL THEN 'removed'
        |         WHEN (a.o_custkey IS NOT DISTINCT FROM b.o_custkey)
        |          AND (a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus)
        |          AND (a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice)
        |          AND (a.o_orderdate IS NOT DISTINCT FROM b.o_orderdate)
        |          AND (a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority)
        |         THEN 'unchanged' ELSE 'changed' END AS status
        |  FROM o1 a FULL OUTER JOIN o2 b ON a.o_orderkey = b.o_orderkey)
        |SELECT status, COUNT(*) AS n, MIN(k) AS min_key
        |FROM d GROUP BY status ORDER BY status""".stripMargin,

    "q_l_skip_scan" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders
        |WHERE o_custkey BETWEEN 100 AND 2000
        |  AND o_totalprice BETWEEN 50000 AND 200000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_l_bloom_lookup" ->
      """SELECT c_custkey, c_name, c_nationkey, c_mktsegment
        |FROM customer WHERE c_name = 'Customer#000000042'
        |ORDER BY c_custkey""".stripMargin,

    "q_l_in_lookup" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_name IN ('Customer#000000042', 'Customer#000000777',
        |                 'Customer#999999999')
        |ORDER BY c_custkey""".stripMargin,

    "q_l_mor_merge" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |d1 AS (SELECT k, p * 2 AS p FROM base WHERE k % 10 = 0),
        |d2 AS (SELECT k, p * 3 AS p FROM base WHERE k % 15 = 0),
        |merged AS (
        |  SELECT k, p FROM d2
        |  UNION ALL SELECT k, p FROM d1 WHERE k NOT IN (SELECT k FROM d2)
        |  UNION ALL SELECT k, p FROM base
        |    WHERE k NOT IN (SELECT k FROM d1) AND k NOT IN (SELECT k FROM d2)
        |)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged""".stripMargin,

    "q_l_mor_delete" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |d1 AS (SELECT k, p * 2 AS p FROM base WHERE k % 10 = 0),
        |del AS (SELECT k FROM base WHERE k % 7 = 0),
        |d3 AS (SELECT k, p * 3 AS p FROM base WHERE k % 15 = 0),
        |merged AS (
        |  SELECT k, p FROM d3
        |  UNION ALL SELECT k, p FROM d1
        |    WHERE k NOT IN (SELECT k FROM del) AND k NOT IN (SELECT k FROM d3)
        |  UNION ALL SELECT k, p FROM base
        |    WHERE k NOT IN (SELECT k FROM d1) AND k NOT IN (SELECT k FROM del)
        |      AND k NOT IN (SELECT k FROM d3)
        |)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged""".stripMargin,

    "q_l_mor_skip" ->
      """WITH base AS (SELECT o_orderkey AS k, o_custkey AS c,
        |                     o_totalprice AS p FROM orders),
        |d1 AS (SELECT k, c, p * 2 AS p FROM base WHERE k % 10 = 0),
        |del AS (SELECT k FROM base WHERE k % 7 = 0),
        |merged AS (
        |  SELECT k, c, p FROM d1 WHERE k NOT IN (SELECT k FROM del)
        |  UNION ALL SELECT k, c, p FROM base
        |    WHERE k NOT IN (SELECT k FROM d1) AND k NOT IN (SELECT k FROM del)
        |)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM merged WHERE c BETWEEN 100 AND 2000""".stripMargin,

    "q_l_schema_evo" ->
      """WITH base AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
        |d1 AS (SELECT k, p * 2 AS p, 'hot' AS tag FROM base WHERE k % 10 = 0),
        |merged AS (
        |  SELECT k, p, tag FROM d1
        |  UNION ALL SELECT k, p, NULL AS tag FROM base
        |    WHERE k NOT IN (SELECT k FROM d1)
        |)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        |  COUNT(tag) AS n_tag,
        |  COUNT(CASE WHEN tag IS NULL THEN 1 END) AS n_untag
        |FROM merged""".stripMargin,

    "q_l_rollback" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_p,
        |  MIN(o_orderkey) AS min_k, MAX(o_orderkey) AS max_k
        |FROM orders""".stripMargin,

    "q_l_snapshot_join" ->
      """SELECT c_mktsegment AS seg, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_p
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY seg""".stripMargin,

    "q_l_cluster_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
