package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §4.2 scale posture).
  *
  * AQE's skew-join split handles moderately skewed SHUFFLE partitions
  * automatically, but a single pathological key (one user with 10⁹
  * events, one boilerplate document hash) still lands every row in one
  * task. Salting is the explicit fix: scatter the fact side across
  * `salt` sub-keys and replicate the (small) dimension side `salt`×, so
  * the hot key's rows spread over `salt` reducers. Exactly equivalent to
  * the plain join (asserted in SkewSpec) at the cost of a `salt`× blowup
  * of the dim side — use for fact⋈dim only, never fact⋈fact.
  */
object SkewOps {

  /** `fact ⋈ dim` on `key`, with the fact side salted into `salt`
    * sub-keys. `dim(key)` must be unique (a dimension), and both inputs
    * must name the key column identically. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    val saltedFact = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }
}
