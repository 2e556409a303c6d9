package graft.ops

/** The FIXTURES.md JSON-STAT cube (the statbank BIL54 shape the reference
  * flattens, producers/statbank/fetch_data_statbank.py:44-66). */
object JsonStatFixture {
  val json: String =
    """{"dataset": {
      |  "label": "Stock of motor vehicles",
      |  "source": "Statistics Denmark",
      |  "updated": "2024-12-10T08:00:00",
      |  "extension": {"px": {"infofile": "x", "tableid": "BIL54", "decimals": 0}},
      |  "dimension": {
      |    "OMRÅDE":  {"category": {"label": {"000": "All Denmark"}}},
      |    "BILTYPE": {"category": {"label": {"4000100001": "Passenger cars"}}},
      |    "BRUG":    {"category": {"label": {"1000": "Total"}}},
      |    "EJER":    {"category": {"label": {"1000": "Total"}}},
      |    "DRIV":    {"category": {"label": {"20225": "Electricity"}}},
      |    "ContentsCode": {"category": {"label": {"BIL54": "Stock"}}},
      |    "Tid": {"category": {"label": {"2024M10": "2024M10", "2024M11": "2024M11"}}}
      |  },
      |  "value": [345001, 345678]}}""".stripMargin
}
