package graft.api

import graft.SparkFunSuite

class OecSpec extends SparkFunSuite {

  private def oec = new Oec(spark, sf)

  test("getData mirrors the reference call shape (oec.py:27-42)") {
    val df = oec.getData(auth = false, cube = "trade",
      drilldown = Seq("Year", "Nation"), measure = Seq("Trade Value"),
      cut = Map("Year" -> "1995"))
    assert(df.columns.toSeq == Seq("year", "nation", "trade_value"))
    assert(df.count() == 25)
  }

  test("comma-separated cut values form an IN-list") {
    val df = oec.getData(auth = false, cube = "trade",
      drilldown = Seq("Year"), measure = Seq("Line Count"),
      cut = Map("Year" -> "1995, 1996"))
    assert(df.select("year").collect().map(_.getInt(0)).toSet == Set(1995, 1996))
  }

  test("Seq cut members pass verbatim — no comma splitting") {
    // string-Map form: comma IS the wire member-list separator
    val wire = oec.getData(auth = false, cube = "trade",
      drilldown = Seq("Nation"), measure = Seq("Line Count"),
      cut = Map("Nation" -> "NATION_1,NATION_2"))
    assert(wire.count() == 2)
    // Seq form: each element is exactly one member — the same string is
    // a single (nonexistent) member value, not a list
    val verbatim = oec.getData(auth = false, cube = "trade",
      drilldown = Seq("Nation"), measure = Seq("Line Count"),
      token = None, cut = Map("Nation" -> Seq("NATION_1,NATION_2")))
    assert(verbatim.count() == 0)
    val multi = oec.getData(auth = false, cube = "trade",
      drilldown = Seq("Nation"), measure = Seq("Line Count"),
      token = None, cut = Map("Nation" -> Seq("NATION_1", "NATION_2")))
    assert(multi.count() == 2)
  }

  test("auth=true without token or OEC_TOKEN throws (parity with oec.py:60)") {
    assume(!sys.env.contains("OEC_TOKEN"))
    intercept[NoSuchElementException] {
      oec.getData(auth = true, cube = "trade",
        drilldown = Seq("Year"), measure = Seq("Trade Value"))
    }
  }

  test("auth=true with explicit token succeeds") {
    val df = oec.getData(auth = true, cube = "trade",
      drilldown = Seq("Year"), measure = Seq("Trade Value"),
      token = Some("t"))
    assert(df.count() > 0)
  }

  test("getMembers payload shape (oec.py:13-18), sorted by id") {
    val m = oec.getMembers(Map("cube" -> "trade", "level" -> "Nation ID")).collect()
    assert(m.map(_.getInt(0)).toSeq == (0 until 25))
    intercept[IllegalArgumentException](oec.getMembers(Map("cube" -> "trade")))
  }

  test("wire grammar byte-for-byte (util.py)") {
    assert(WireFormat.genCut(Seq("Year" -> "2020", "Trade Flow" -> "2"))
      == "Year=2020&Trade Flow=2")
    assert(WireFormat.genCut(Nil) == "")
    assert(WireFormat.genMsrDd(Seq("Trade Value", "Quantity"))
      == "Trade Value,Quantity")
  }
}
