package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's formatted text sink (`/root/reference/mapreduce.erl:204-214`):
  * each sorted key/value pair as `~s: ~c~c ~w\r\n` with two literal tabs —
  * `"ab: \t\t 12\r\n"`. Byte-golden for integer counts (Erlang `~w` and
  * JVM Long.toString agree); float probabilities use JVM repr, which
  * diverges from Erlang's — goldens for those compare parsed values
  * (SURVEY.md §7 risk register).
  *
  * Parity-mode sink: the reference writes one sorted file, so this
  * coalesces to a single partition — applied AFTER aggregation, where the
  * data is at most the key-domain size (≤676 bigrams), never on raw data. */
object ReferenceSink {

  /** Format as the reference's results.txt lines (without the trailing
    * newline — the text writer adds '\n', completing the CRLF). */
  def formatted(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.orderBy(keyCol)
      .select(concat(col(keyCol), lit(": \t\t "), col(valCol).cast("string"),
        lit("\r")).as("value"))

  /** Write `results.txt`-style output: sorted, single file. */
  def writeCounts(df: DataFrame, keyCol: String, valCol: String,
      path: String): Unit =
    formatted(df, keyCol, valCol).coalesce(1)
      .write.mode("overwrite").text(path)
}
