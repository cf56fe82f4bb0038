package graft

/** The single data abstraction of the reference store: a timestamped RDF
  * triple (row shape `MongoDBConnector.py:88`; SURVEY §1.1). `ts_ms` is
  * epoch-millis (the reference's `"%Y-%m-%d %H:%M:%S.%f"` strings parsed
  * once at the boundary, `MongoDBConnector.py:69`). */
case class Triple(subject: String, predicate: String, `object`: String,
    ts_ms: Long)
