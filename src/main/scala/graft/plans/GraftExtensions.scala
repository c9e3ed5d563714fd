package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension wiring for graft's native expressions — enable
  * with `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (done by Verify/Bench/tests); the functions then resolve from both
  * the SQL parser and `expr(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo(classOf[HammingDistance].getName, "graft_hamming"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_hamming(a, b) takes two arguments")
        HammingDistance(args.head, args(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectPlannerStrategy(_ => AsofJoinStrategy)
    ext.injectOptimizerRule(_ => Hex32Rewrite)
    ext.injectFunction((
      FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_shingle_hashes(tokens) takes one argument")
        ShingleHashes(args.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_hex32"),
      new ExpressionInfo(classOf[Hex32].getName, "graft_hex32"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hex32(s) takes one argument")
        Hex32(args.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash(tokens) takes one argument")
        MinHashSig(args.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_hashes"),
      new ExpressionInfo(classOf[MinHashFromHashes].getName, "graft_minhash_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_minhash_hashes(hashes) takes one argument")
        MinHashFromHashes(args.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b) takes two arguments")
        DotProduct(args.head, args(1))
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash(hashes) takes one argument")
        SimHash32(args.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
