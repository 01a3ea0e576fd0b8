package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator
import java.util.concurrent.ConcurrentHashMap

/** Process-scoped scratch directories for queries that must materialize
  * an artifact before reading it back (the CCSDS binary round-trip, the
  * persisted IVF index).
  *
  * Two properties the raw createTempDirectory call lacked:
  *   - `cached` builds the artifact ONCE per (key, JVM): repeated
  *     invocations of the same query in one session (Verify + the
  *     bench's two timed runs) read the artifact instead of rebuilding
  *     and re-writing it — the measured cost is the read path;
  *   - every directory is removed by a JVM shutdown hook, so repeated
  *     sessions don't accumulate packet dumps and index files in /tmp.
  *
  * The cache key must encode every input the artifact depends on
  * (testdata dir + parameters); staleness across JVMs is impossible
  * because the directory dies with the JVM that built it.
  */
object TempDirs {

  private val cache = new ConcurrentHashMap[String, String]()
  private val locks = new ConcurrentHashMap[String, Object]()
  private val buildSecs = new ConcurrentHashMap[String, java.lang.Double]()

  /** Directory holding the artifact for `key`, building it on first use.
    *
    * NOT computeIfAbsent on the artifact map: a build that itself calls
    * `cached` for a DEPENDENCY (the cluster table builds from the staged
    * shingle index) would nest computeIfAbsent on one ConcurrentHashMap —
    * an IllegalStateException("Recursive update") whenever the two keys
    * land in the same bin (bin-count-dependent, so it escaped the large
    * bench JVM and surfaced in the test JVM). A per-key lock object
    * (whose computeIfAbsent lambda calls nothing) serializes builders of
    * the same key while letting dependent builds of other keys proceed.
    */
  def cached(key: String)(build: String => Unit): String = {
    val hit = cache.get(key)
    if (hit != null) return hit
    val lock = locks.computeIfAbsent(key, _ => new Object)
    lock.synchronized {
      val again = cache.get(key)
      if (again != null) again
      else {
        val dir = fresh("graft_scratch")
        val t0 = System.nanoTime()
        try build(dir)
        catch {
          case e: Throwable =>
            // a failed build must leave a trace: without this the lock
            // releases with neither cache nor buildSecs populated, a
            // later caller silently rebuilds into a fresh dir, and the
            // failed attempt's cost appears in NO artifact (it inflates
            // the first rep of whichever query retried). The "FAILED"
            // prefix keeps it a distinct staging entry; the scratch dir
            // itself dies with the JVM (deleteOnExit).
            buildSecs.merge(s"FAILED:$key", (System.nanoTime() - t0) / 1e9,
              (a, b) => Double.box(a + b))
            System.err.println(
              s"TempDirs: staged build for '$key' FAILED after " +
                f"${(System.nanoTime() - t0) / 1e9}%.1f s: $e")
            throw e
        }
        buildSecs.put(key, (System.nanoTime() - t0) / 1e9)
        cache.put(key, dir)
        dir
      }
    }
  }

  /** Seconds spent building each cached artifact this JVM, keyed by the
    * cache key's prefix (the part before the first ':'). Under min-of-N
    * per-query timing the one-time build lands inside a discarded first
    * rep and would otherwise appear in NO recorded number — Bench emits
    * this map as a separate "staging" entry so the artifact carries the
    * true session cost alongside the per-query marginal minima.
    */
  def stagingSeconds: Map[String, Double] =
    { import scala.jdk.CollectionConverters._
      // a failed build keeps its artifact prefix visible ("FAILED:key",
      // not one undifferentiated "FAILED" bucket): the artifact must
      // say WHICH staged build failed, or a flaky stager is
      // indistinguishable from another
      def prefix(k: String): String =
        if (k.startsWith("FAILED:"))
          "FAILED:" + k.stripPrefix("FAILED:").takeWhile(_ != ':')
        else k.takeWhile(_ != ':')
      buildSecs.asScala.toSeq
        .groupBy(kv => prefix(kv._1))       // sum: a prefix may have
        .map { case (p, kvs) =>             // several keyed builds
          p -> kvs.map(_._2.doubleValue()).sum }
    }

  /** A new empty directory, deleted at JVM exit. */
  def fresh(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    deleteOnExit(dir)
    dir.toString
  }

  private def deleteOnExit(dir: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try {
        if (Files.exists(dir)) {
          Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => { val _ = Files.deleteIfExists(p) })
        }
      } catch { case _: Throwable => () }))
}
