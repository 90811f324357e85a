package graft.queries

import org.apache.spark.sql.SparkSession

/** Run-scoped names for gate-internal warehouse tables.
  *
  * Gates that persist an index (`g_mh_idx`, `g_dh_idx`, the BM25 and
  * IVF tables, ...) write into the SHARED `spark-warehouse` directory.
  * With fixed names, two processes running the same gate concurrently
  * (e.g. ClusterBench and a selfcheck sweep) overwrite-race each
  * other's table mid-read — a documented false-red (SCALE.md r13's
  * "LOOKED like a failure"). Suffixing every gate-scoped table with a
  * per-process tag makes concurrent runs disjoint by construction;
  * results are unaffected (the names are internal plumbing).
  *
  * The tag is the JVM pid by default — unique among LIVE processes on
  * the box, which is exactly the collision domain of the shared
  * warehouse — overridable via GRAFT_RUN_TAG for drivers that want
  * deterministic names. [[sweepStale]] reclaims dirt left by crashed
  * runs: gate tables tagged with a pid that is no longer alive. */
object GateTables {

  val runTag: String =
    sys.env.getOrElse("GRAFT_RUN_TAG",
      java.lang.ProcessHandle.current().pid().toString)

  /** `base` -> `base_<tag>`; use for every CREATE and every read of a
    * gate-scoped table so both sides resolve to this run's copy. */
  def name(base: String): String = s"${base}_$runTag"

  // A gate table carries its pid as a full underscore-delimited
  // all-digit segment, possibly followed by a derived suffix
  // (writeBm25Index's `<prefix>_df` etc.). >= 2 digits so a base name
  // merely ENDING in one digit (g_mh_idx2) can never parse as a pid.
  // Corollary: never name a gate-table base with a bare >= 2-digit
  // numeric segment.
  private val GatePidDir = "^g_[a-z0-9_]+_([0-9]{2,})(?:_[a-z0-9_]+)?$".r

  /** Delete warehouse directories of gate tables whose pid tag is no
    * longer a live process — crash dirt from previous runs. Never
    * touches a live run's tables (pid liveness check) nor anything
    * that doesn't match the `g_*_<pid>` shape. Call once at startup
    * (Verify/Bench do); failures are swallowed — cleanup must never
    * fail a run. */
  def sweepStale(spark: SparkSession): Unit =
    try {
      val whDir = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"))
      val fs = whDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(whDir)) fs.listStatus(whDir).foreach { st =>
        st.getPath.getName match {
          case GatePidDir(pid) if pid != runTag &&
              !java.lang.ProcessHandle.of(pid.toLong)
                .map[java.lang.Boolean](p => p.isAlive).orElse(false) =>
            fs.delete(st.getPath, true); ()
          case _ => ()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
