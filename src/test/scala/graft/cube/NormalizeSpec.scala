package graft.cube

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Properties}

/** Fidelity to the reference rename contract (`oec.py:24`, `oec.py:64`):
  * every column name -> name.replace(' ', '_').lower().
  */
class NormalizeSpec extends AnyFunSuite {

  test("reference examples normalize exactly (FIXTURES.md B)") {
    assert(Normalize.norm("Country ID") == "country_id")
    assert(Normalize.norm("Trade Value") == "trade_value")
    assert(Normalize.norm("Year") == "year")
    assert(Normalize.norm("Subnat Geography") == "subnat_geography")
    assert(Normalize.norm("ID") == "id")
  }
}

/** Property checks (raw ScalaCheck — runs under sbt's scalacheck
  * framework).
  */
object NormalizeProps extends Properties("Normalize") {
  property("idempotent") = Prop.forAll(Gen.asciiPrintableStr) { s =>
    Normalize.norm(Normalize.norm(s)) == Normalize.norm(s)
  }
  property("space-free and lowercase") = Prop.forAll(Gen.asciiPrintableStr) { s =>
    val n = Normalize.norm(s)
    !n.contains(" ") && n == n.toLowerCase
  }
}
