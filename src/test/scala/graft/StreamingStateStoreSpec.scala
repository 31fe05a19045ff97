package graft

import graft.streaming.{StatefulSessions, StreamingConfig}

/** RocksDB state-store wiring (SURVEY §12 / DESIGN "streaming state at
  * scale"): the production conf set must actually drive our stateful
  * operators — same flatMapGroupsWithState sessionizer, RocksDB
  * provider + changelog checkpointing — and produce bit-identical
  * output to the default HDFS-backed provider. Recovery-latency and
  * state-size claims need a real cluster and stay documentation-level
  * (DESIGN.md); what IS checked here is that the configs are the real
  * Spark keys and the provider loads and runs (rocksdbjni ships in
  * Spark's jars).
  */
class StreamingStateStoreSpec extends SparkSpec {

  private def sessions(name: String): Set[(Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    StatefulSessions
      .runBounded(spark, s"${sf("sf0.001")}/events.parquet", name)
      .select("user_id", "session_num", "session_start_s", "session_end_s", "n_events")
      .as[(Long, Long, Long, Long, Long)]
      .collect().toSet
  }

  test("stateful sessionizer runs on RocksDB + changelog checkpointing, output identical") {
    val defaultOut = sessions("sss_default_provider")
    assert(defaultOut.nonEmpty)
    val before = StreamingConfig.productionStateStore().keys
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      StreamingConfig.applyProduction(spark, maxMemoryUsageMB = 256)
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == StreamingConfig.RocksDBProvider)
      val rocksOut = sessions("sss_rocksdb_provider")
      assert(rocksOut == defaultOut,
        "RocksDB-backed run diverged from the default provider")
    } finally {
      // restore — other streaming suites share this session
      before.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
