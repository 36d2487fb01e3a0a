package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The noise seam of the differentially-private release family
  * (`q_report_dp_counts`): the MECHANISM — sensitivity-calibrated
  * Laplace scale, exact inverse CDF, one draw per released statistic —
  * is fixed by the shared emission expression
  * ([[graft.queries.CurationQueries.dpNoisyMilliExpr]]); what varies
  * between an auditable graded release and a production release is
  * ONLY where the uniform comes from. This trait is that seam: an impl
  * appends a uniform column in (0, 1), one draw per row, and names its
  * mechanism so the ARTIFACT carries the provenance (a data owner must
  * be able to tell a deterministic audit release from a publishable
  * one without reading scaladoc — the round-9 advice).
  *
  * Both impls guarantee u strictly inside (0, 1): the inverse CDF takes
  * ln(1 − 2|u − ½|), which is −∞ at the endpoints. */
trait NoiseSource extends Serializable {

  /** Append uniform column `uCol` ∈ (0, 1), one draw per row. `keyCol`
    * is the released group key (the seed for deterministic impls;
    * ignored by fresh-draw impls). */
  def withUniform(df: DataFrame, keyCol: String, uCol: String): DataFrame

  /** Mechanism label released WITH the statistic. */
  def mechanism: String
}

object NoiseSource {

  /** Deterministic draws seeded by the released key — the GRADED-PATH
    * impl: auditable (anyone can re-derive the draw) and
    * oracle-gradable, which is exactly why it provides NO privacy
    * against an adversary who knows the salt (the noise inverts
    * exactly; effective ε is unbounded). The mechanism label says so:
    * artifacts stamped `seeded-deterministic-audit` grade the
    * mechanism, they do not protect anything. */
  final class Seeded(salt: String) extends NoiseSource {
    override val mechanism: String = "seeded-deterministic-audit"
    override def withUniform(df: DataFrame, keyCol: String,
        uCol: String): DataFrame =
      df.withColumn(uCol, expr(
        // (0,1): +1 keeps u off 0 exactly; 2^60+1 keeps it off 1.
        s"""(CAST(conv(substring(md5(concat($keyCol, ':$salt')), 1, 15),
           |  16, 10) AS BIGINT) + 1.0) / 1152921504606846977.0"""
          .stripMargin.replace("\n", " ")))
  }

  /** Fresh unpredictable draws — the production-shaped impl: the seed
    * comes from `java.security.SecureRandom` PER RELEASE, so no two
    * releases repeat and an adversary cannot re-derive the draws from
    * public inputs. Honesty bound: Spark's `rand` expands the seed
    * with XORShift, not a cryptographic generator — unpredictability
    * rests on the 64-bit secret seed, which is the standard DP-library
    * trade (e.g. seeded counter-mode generators) but weaker than a
    * per-draw CSPRNG; a deployment wanting that swaps in a
    * SecureRandom-per-draw impl behind this same interface. Releases
    * through this source still spend ε budget per release — tracking
    * that budget across releases remains the caller's job. */
  final class Fresh extends NoiseSource {
    override val mechanism: String = "fresh-prng"
    override def withUniform(df: DataFrame, keyCol: String,
        uCol: String): DataFrame = {
      val seed = new java.security.SecureRandom().nextLong()
      // rand ∈ [0,1): the affine map pulls both endpoints strictly
      // inside (0,1) without disturbing the distribution measurably.
      df.withColumn(uCol,
        (rand(seed) * lit(1152921504606846975.0) + lit(1.0))
          / lit(1152921504606846977.0))
    }
  }
}
