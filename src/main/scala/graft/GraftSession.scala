package graft

import org.apache.spark.sql.SparkSession

/** Session factory with scale-oriented defaults.
  *
  * The reference (`/root/reference/src/main.py`) wires its pipeline through a
  * config singleton (`src/utils/config.py:1`); here the equivalent knobs are
  * Spark confs chosen for a large cluster but safe on local[N]:
  *
  *  - AQE on (runtime partition coalescing + skew-join splitting) so the
  *    same code survives 100x data-volume changes without re-tuning.
  *  - shuffle partitions sized to the parallelism at hand (the driver runs
  *    local[32]; on a real cluster this would be 2-3x total cores and AQE
  *    coalesces the excess).
  *  - broadcast threshold left at default; small dims are hinted explicitly
  *    with `broadcast()` where the size is known a priori.
  */
object GraftSession {

  /** External conf overrides (parity with the reference's
    * `src/utils/config.py` + `config/config.yaml` layering): a
    * `key=value` properties file of Spark confs, resolved from the
    * `GRAFT_CONF` env var or a `graft.conf` in the working directory.
    * File entries win over the code defaults below; absent file = pure
    * defaults (same precedence the reference gives yaml-over-defaults).
    *
    * Values may reference environment variables as `${VAR}` (the
    * reference's `_substitute_env_vars`, config.py:70 — how warehouse
    * credentials reach a JDBC conf without living in the file). An UNSET
    * variable fails loudly with the key and variable named — a silently
    * empty password is a debugging session.
    */
  def overrides(confFile: Option[String] = None): Map[String, String] = {
    val path = confFile
      .orElse(sys.env.get("GRAFT_CONF"))
      .getOrElse("graft.conf")
    val f = new java.io.File(path)
    if (!f.isFile) Map.empty
    else {
      val props = new java.util.Properties()
      val in = new java.io.FileInputStream(f)
      try props.load(in) finally in.close()
      import scala.jdk.CollectionConverters._
      props.asScala.toMap.map { case (k, v) => k -> substituteEnvVars(k, v) }
    }
  }

  private val EnvVarPattern = """\$\{([A-Za-z_][A-Za-z0-9_]*)\}""".r

  /** Replace every `${VAR}` in `value` with the environment variable's
    * value; throw (naming the conf key and the variable) when unset.
    * `env` is injectable for tests — the JVM cannot set real env vars.
    */
  private[graft] def substituteEnvVars(
      key: String, value: String,
      env: String => Option[String] = sys.env.get): String =
    EnvVarPattern.replaceAllIn(value, m => {
      val name = m.group(1)
      val resolved = env(name).getOrElse(throw new IllegalArgumentException(
        s"GraftSession: conf '$key' references environment variable " +
          s"$${$name}, which is not set"))
      scala.util.matching.Regex.quoteReplacement(resolved)
    })

  def builder(master: String, shufflePartitions: Int,
              confFile: Option[String] = None): SparkSession.Builder =
    overrides(confFile).foldLeft(defaultBuilder(master, shufflePartitions)) {
      case (b, (k, v)) => b.config(k, v)
    }

  private def defaultBuilder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // AQE's coalescer refuses to split below minPartitionSize (1 MiB
      // default) even when that leaves most cores idle: a 5 MB
      // post-shuffle stage of window scans or text kernels coalesces to
      // 5 tasks on a 32-core session. 256k keeps tiny-but-compute-heavy
      // stages wide without drowning trivial stages in task overhead
      // (64k measured faster on window families but regressed global-
      // window and tiny-join queries; 256k held both sets). At cluster
      // scale shuffles dwarf the advisory size (64 MiB, untouched) and
      // this floor is inert. Overridable via graft.conf like every conf
      // here.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Sketch ops (MinHash affine perms, rolling fingerprints) are defined
      // over Z/2^64 — Java long wraparound IS the semantics, so ANSI
      // overflow-checking is off (Spark 3.x default; DuckDB oracles use
      // explicit casts so cross-engine compares are unaffected).
      .config("spark.sql.ansi.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
      // rejects; read as raw long nanos and convert in Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")

  /** Local session honoring the driver's SPARK_GRAFT_CPUS contract
    * (falling back to all available cores, never a hardcoded small N).
    */
  def local(): SparkSession = {
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    val spark = builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
