package graft.operators.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Test-corpus page shaping: derives multi-line, punctuation-bearing
  * "crawled pages" from the synthetic single-line word soup, so the
  * page-level cleaners (gopher/C4) have real structure to act on —
  * terminal periods planted on eight common words, doc_id-keyed
  * mojibake/lorem/brace suffixes, then 5-word line chunking. The SAME
  * formula feeds the `c4_clean`-style derivations, the curation
  * capstone keys and the shipped fineweb demo config, and every
  * consumer's DuckDB oracle repeats it verbatim (single source of
  * truth here). A real crawl arrives as pages; this op exists so the
  * demo corpus does too. */
object SyntheticPages {
  def pageText(text: Column, id: Column): Column =
    regexp_replace(
      concat(
        regexp_replace(
          regexp_replace(text,
            "(table|value|part|row|data|join|key|hash)", "$1."),
          "spark", "javascript"),
        when(id % 10 === 0, lit(" donâ€™t stop.")).otherwise(lit("")),
        when(id % 11 === 0, lit(" lorem ipsum")).otherwise(lit("")),
        when(id % 13 === 0, lit(" {")).otherwise(lit(""))),
      "((?:\\S+ ){4}\\S+) ", "$1\n")
}
