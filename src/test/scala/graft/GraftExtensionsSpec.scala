package graft

import org.apache.spark.sql.SparkSession

/** `spark.sql.extensions=graft.GraftExtensions` must expose every native
  * function to a session that runs no Scala registration code.
  *
  * The conf itself is static (read from the SparkContext's conf at first
  * session construction), so a shared-JVM test can't exercise the string
  * form; `builder.withExtensions(new GraftExtensions)` is the same code
  * path `applyExtensions` runs after instantiating the configured class
  * name. Builds a second SparkSession over the shared SparkContext, then
  * restores the shared session.
  */
class GraftExtensionsSpec extends SparkFunSuite {

  test("extensions conf registers all native functions for SQL-only callers") {
    val orig = spark // force the shared context into existence
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      assert(s2 ne orig, "expected a fresh session so extensions apply")
      val row = s2.sql(
        """SELECT size(word_shingles('a b c d', 2))            AS n_shingles,
          |       size(minhash_sig(array('a','b'), 8))         AS n_sig,
          |       size(simhash_signs(array('a'), 16))          AS n_signs,
          |       cosine_similarity(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS cos,
          |       dot_product(array(2.0d, 1.0d), array(3.0d, 4.0d))       AS dot,
          |       jaro_winkler('DWAYNE', 'DUANE')                         AS jw
          |""".stripMargin).head()
      assert(row.getInt(0) == 3)
      assert(row.getInt(1) == 8)
      assert(row.getInt(2) == 16)
      assert(math.abs(row.getDouble(3) - 1.0) < 1e-12)
      assert(math.abs(row.getDouble(4) - 10.0) < 1e-12)
      assert(math.abs(row.getDouble(5) - 0.84) < 1e-12)

      // Identical results to the programmatic registration path.
      val viaRegister = {
        functions.TextExpressions.register(orig)
        orig.sql("SELECT minhash_sig(array('x','y','z'), 16) AS s").head().getSeq[Long](0)
      }
      val viaExtensions =
        s2.sql("SELECT minhash_sig(array('x','y','z'), 16) AS s").head().getSeq[Long](0)
      assert(viaExtensions == viaRegister)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.setDefaultSession(orig)
      SparkSession.setActiveSession(orig)
    }
  }
}
