package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers shared across operator families. */
object Cols {

  /** Column-level let binding: evaluates `e` once per row and exposes the
    * result to `f` as a lambda variable.
    *
    * Catalyst has no common-subexpression reuse inside higher-order
    * function lambdas: a lambda body that references a non-trivial
    * expression re-evaluates it PER ELEMENT. For an expression like
    * word-shingling — `transform(seq, i => slice(tokens, i, n))` where
    * `tokens` is a regex-normalize + split tree — that turns one regex
    * pass per row into one per shingle, O(words²) per document. Binding
    * `tokens` through a single-element `transform` makes it a lambda
    * variable (a plain slot read) inside `f`.
    */
  def bind(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Two-value let binding (see [[bind]]). */
  def bind2(e1: Column, e2: Column)(f: (Column, Column) => Column): Column =
    element_at(zip_with(array(e1), array(e2), (x, y) => f(x, y)), 1)
}
