package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.cube.{CubeQuery, Engine}

/** Drop-in analog of the reference client class `OEC` (`oec.py:8`): same
  * call shapes, same semantics, but the "server side" is the local Spark
  * engine instead of a remote olap-proxy.
  *
  *   - `getData` ≡ `OEC.get_data(auth, cube, drilldown, measure, token,
  *     cut)` (`oec.py:27-66`): drilldowns group, measures aggregate, cuts
  *     filter; result column names are normalized. The reference's
  *     awkward positional `token` and `auth` gate are preserved as API
  *     semantics: when `auth=true` and no token is given, the OEC_TOKEN
  *     environment variable is required and its absence throws — matching
  *     the KeyError at `oec.py:60`. (No token is ever transmitted
  *     anywhere; it is validated for parity only.)
  *   - `getMembers` ≡ `OEC.get_members(payload)` (`oec.py:12-25`),
  *     with the *intended* sort-by-ID (the reference builds the sorted
  *     frame and discards it, `oec.py:23` — we keep the intent, not the
  *     bug; divergence documented here).
  *   - cuts arrive stringly-typed exactly like the reference docstring
  *     ({'Year': '2020'}, `oec.py:30-33`) and are coerced to level types.
  *   - callers' Maps are never mutated (Scala immutability discharges the
  *     defensive `cut.copy()` at `oec.py:48`).
  */
class Oec(spark: SparkSession, dataDir: String) {

  private val engine = new Engine(spark, dataDir)

  /** Reference `get_data` (`oec.py:27`). Multi-member cuts use the same
    * Map with comma-separated values — that IS the olap-proxy wire syntax
    * for member lists, so this overload is wire-compatible but cannot
    * express a single member whose value contains a literal comma. For
    * lossless multi-member cuts use the `Map[String, Seq[String]]`
    * overload below, where every element is one member verbatim.
    */
  def getData(
      auth: Boolean,
      cube: String,
      drilldown: Seq[String],
      measure: Seq[String],
      token: Option[String] = None,
      cut: Map[String, String] = Map.empty): DataFrame = {
    val cuts = cut.map { case (k, v) => k -> v.split(",").map(_.trim).toSeq }
    getData(auth, cube, drilldown, measure, token, cuts)(DummyImplicit.dummyImplicit)
  }

  /** Lossless cut form: each Seq element is exactly one member value (no
    * comma convention, no splitting). (`DummyImplicit` only disambiguates
    * the two Map erasures.)
    */
  def getData(
      auth: Boolean,
      cube: String,
      drilldown: Seq[String],
      measure: Seq[String],
      token: Option[String],
      cut: Map[String, Seq[String]])(implicit d: DummyImplicit): DataFrame = {
    if (auth) {
      token.orElse(sys.env.get("OEC_TOKEN")).getOrElse(
        throw new NoSuchElementException(
          "OEC_TOKEN not set and no token passed (parity with oec.py:60)"))
    }
    engine.getData(CubeQuery(cube, drilldown, measure, cut))
  }

  /** Reference `get_members` (`oec.py:12`): payload {'cube', 'level'}. */
  def getMembers(payload: Map[String, String]): DataFrame = {
    val cube = payload.getOrElse("cube",
      throw new IllegalArgumentException("payload must contain 'cube'"))
    val level = payload.getOrElse("level",
      throw new IllegalArgumentException("payload must contain 'level'"))
    engine.getMembers(cube, level)
  }
}

/** The reference's `util.py` query-string builders, byte-for-byte: the
  * documented wire grammar of the olap-proxy (dead code relative to the
  * OEC class in the reference too — `SURVEY.md` §3.3 — kept for surface
  * completeness).
  */
object WireFormat {

  /** `gen_cut` (`util.py:1-9`): {'Year': '2020', 'Trade Flow': '2'} ->
    * "Year=2020&Trade Flow=2". NB deliberately NO URL escaping — verified
    * reference behavior (the space survives).
    */
  def genCut(cut: Seq[(String, String)]): String =
    cut.map { case (k, v) => s"$k=$v" }.mkString("&")

  /** `gen_msr_dd` (`util.py:11-23`): ['a','b'] -> "a,b" (comma, no
    * space — unlike OEC.get_data's ", " join at `oec.py:50-51`).
    */
  def genMsrDd(msr: Seq[String]): String = msr.mkString(",")
}
