package graft.functions

import org.apache.spark.sql.Column

/** Engine-facing custom function surface (SURVEY.md §2.11). */
object VectorFunctions {

  /** Codegen'd sequential dot product over two `array<double>` columns —
    * see [[org.apache.spark.sql.graft.DotProduct]].
    */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.column(a, b)

  /** Codegen'd 8-bit scalar-quantization encode over `array<double>`
    * columns (vector, per-dimension mins, per-dimension maxs) — see
    * [[org.apache.spark.sql.graft.QuantizeCode]].
    */
  def quantizeCode(vec: Column, mins: Column, maxs: Column): Column =
    org.apache.spark.sql.graft.QuantizeCode.column(vec, mins, maxs)

  /** Codegen'd decode-corrected dot product over two binary code columns
    * (+ per-dimension min/max literals) — see
    * [[org.apache.spark.sql.graft.DequantizeDot]].
    */
  def dequantizeDot(a: Column, b: Column, mins: Column, maxs: Column): Column =
    org.apache.spark.sql.graft.DequantizeDot.column(a, b, mins, maxs)

  /** Codegen'd L2 normalization over an `array<double>` column — see
    * [[org.apache.spark.sql.graft.UnitVector]].
    */
  def unitVector(v: Column): Column =
    org.apache.spark.sql.graft.UnitVector.column(v)

  /** Codegen'd product-quantization encode (m sub-codes, one byte each) —
    * see [[org.apache.spark.sql.graft.PqEncode]].
    */
  def pqCode(vec: Column, centFlat: Column, m: Column): Column =
    org.apache.spark.sql.graft.PqEncode.column(vec, centFlat, m)

  /** Codegen'd asymmetric-distance PQ scoring (full query vector × m-byte
    * neighbor code) — see [[org.apache.spark.sql.graft.PqAdcDot]].
    */
  def pqAdcDot(q: Column, code: Column, centFlat: Column): Column =
    org.apache.spark.sql.graft.PqAdcDot.column(q, code, centFlat)
}
