package graft

import org.apache.spark.sql.{GraftColumnBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Spark's standard extension entry point: build any session with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` and the
  * engine's native SQL functions (graft_dot, graft_token_hashes,
  * graft_shingle_hashes, graft_minhash_bands, graft_simhash) are available
  * in every new session's SQL surface without an explicit registration
  * call — the idiomatic way a Spark-native library installs itself on a
  * cluster (spark-defaults.conf carries the one config line; every job,
  * notebook, and Thrift session gets the functions).
  *
  * [[org.apache.spark.sql.GraftColumnBridge.registerFunctions]] remains for
  * installing into an already-built session; both paths share one function
  * table so the surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftColumnBridge.functionTable.foreach { case (name, arity, build) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        GraftColumnBridge.builderFor(name, arity, build)))
    }
    // Optimizer rule: naive band joins plan as a binned equi join instead
    // of a nested loop (see graft.plans.BandJoinToBinEquiJoin; kill switch
    // spark.graft.bandJoinRewrite=false).
    ext.injectOptimizerRule(_ => graft.plans.BandJoinToBinEquiJoin)
  }
}
