package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Source lint for the three driver-side anti-patterns a scale review
  * hunts by hand: `.collect()` (driver materialization), `crossJoin`
  * without an inline `broadcast(...)` argument, and `.rdd` (leaving the
  * declarative plan). Every existing site has been audited (driver-sized
  * model state, bounded grids, or LogicalRDD bookkeeping — see the
  * per-file notes below); this spec pins the audited COUNT per file, so
  * a new site anywhere fails CI and must either justify a ceiling bump
  * here or use the scalable form. Ceilings are exact, not upper bounds —
  * a removed site must lower its ceiling, keeping the map current.
  */
class DriverHotspotLintSpec extends AnyFunSuite {

  private val root = Paths.get("src/main/scala")

  private def sources: Seq[Path] =
    Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq.sortBy(_.toString)

  private def countIn(p: Path, pattern: String): Int =
    pattern.r.findAllIn(Files.readString(p)).size

  private def rel(p: Path): String = root.relativize(p).toString

  private def assertCeilings(what: String, pattern: String,
      audited: Map[String, Int]): Unit = {
    val got = sources.map(p => rel(p) -> countIn(p, pattern))
      .filter(_._2 > 0).toMap
    val unexpected = got.filterNot { case (f, n) => audited.get(f).contains(n) }
    val stale = audited.filterNot { case (f, n) => got.get(f).contains(n) }
    assert(unexpected.isEmpty && stale.isEmpty,
      s"$what sites drifted from the audited map.\n" +
        s"  found-but-not-audited-at-that-count: $unexpected\n" +
        s"  audited-but-not-found-at-that-count: $stale\n" +
        "New driver-side sites need a scalable rewrite or a conscious " +
        "ceiling bump WITH a justification note here.")
  }

  test("collect() stays confined to audited driver-sized model state") {
    assertCeilings("collect()", """\.collect\(\)""", Map(
      // 25-row fixture capture for the q97 batch query set
      "graft/SparkEntry.scala" -> 1,
      // 1-row aggregate: corpus-wide signature count
      "graft/operators/Dedup.scala" -> 1,
      // q283 Markov transition matrix: <= #event-types² exact-count
      // cells (require-guarded <= 65536) — model-state-sized by
      // construction; the 12-step power iteration is driver arithmetic
      // instead of 12 scheduled shuffle rounds
      "graft/operators/EventAnalytics.scala" -> 1,
      // <= 25-brand key list probing the driver-held CMS (q301 —
      // sketch + key list are model-state-sized by construction)
      "graft/operators/Relational.scala" -> 1,
      // k-means centroids (k x dim), 1-row query-vector fetches, plus
      // q306 PQ: one query-row fetch + per-subspace codebook collection
      // (codeK x dsub each — model state), plus q309's eval-suite fetch
      // (bounded benchmark set by contract, require-guarded <= 1e6,
      // broadcast to the decontam max-dot kernel)
      "graft/operators/Similarity.scala" -> 8,
      // 1-row aggregate: the q109 watermark cutoff
      "graft/streaming/EventsStream.scala" -> 1))
  }

  test("crossJoin without inline broadcast stays confined to audited bounded frames") {
    // crossJoin(broadcast(...)) is the sanctioned 1-row/bounded-total
    // pattern; count only the remainder
    val pat = """\.crossJoin\((?!broadcast)"""
    assertCeilings("non-broadcast crossJoin", pat, Map(
      // pre-broadcast val: bruteForceTopK's 1-row query frame
      "graft/operators/Similarity.scala" -> 1,
      // bounded event-type distinct against the <= #bins frame (q270)
      "graft/operators/EventAnalytics.scala" -> 1))
  }

  test(".rdd access stays confined to LogicalRDD checkpoint bookkeeping") {
    assertCeilings(".rdd", """\.rdd\b""", Map(
      // localCheckpoint block-release plumbing (ids, unpersist) plus
      // stageShared's reliable-mode persist of the checkpointed RDD —
      // never a data path
      "graft/operators/Scratch.scala" -> 2,
      "graft/operators/Dedup.scala" -> 1,
      "graft/operators/Similarity.scala" -> 1,
      // counts-memo invalidation: same block-release bookkeeping
      "graft/operators/Corpus.scala" -> 1,
      // partition-count probe on the analyzed plan (no job)
      "graft/operators/Par.scala" -> 1))
  }
}
