package graft.core

/** Exact arithmetic with the ANSI error surface (ADVICE r11): driver
  * fast-path kernels (gmm2Em / logisticIrls histogram loops, the graph
  * BFS/Brandes kernels) must ERROR on exactly the inputs where their
  * distributed twins error under this session's ANSI mode, never wrap or
  * skip — otherwise a query's outcome (error vs result) would depend on
  * which side of a rollup/edge gate the data lands. */
object AnsiNum {
  private val D38Max = BigInt(10).pow(38)

  /** decimal(38,0) representability check: the distributed branches run
    * their products and sums as decimal(38,0) with a per-operation
    * CheckOverflow under ANSI — a BigInt value only a decimal(38,0)
    * CANNOT hold must therefore throw here too. Applied per product
    * step (left-associated, like the exprs) and per accumulation; the
    * one thing not replicable is a distributed partial-sum that
    * transiently overflows in some partition order — that path is
    * nondeterministic on the distributed side itself. */
  def d38(v: BigInt): BigInt =
    if (v.abs >= D38Max) throw new ArithmeticException(
      "[NUMERIC_VALUE_OUT_OF_RANGE] decimal(38,0) overflow — replicates " +
        "the ANSI error of the distributed branch")
    else v

  /** ANSI `cast(decimal as long)`: throws on overflow instead of wrapping. */
  def toLongExact(v: BigInt): Long =
    if (v.isValidLong) v.toLong
    else throw new ArithmeticException(
      "[CAST_OVERFLOW] decimal to long overflow — replicates the ANSI " +
        "error of the distributed branch")

  def sub(a: Long, b: Long): Long =
    try math.subtractExact(a, b) catch { case _: ArithmeticException =>
      throw new ArithmeticException(
        "[ARITHMETIC_OVERFLOW] long overflow on subtraction — replicates " +
          "the ANSI error of the distributed branch") }
  def add(a: Long, b: Long): Long =
    try math.addExact(a, b) catch { case _: ArithmeticException =>
      throw new ArithmeticException(
        "[ARITHMETIC_OVERFLOW] long overflow on addition — replicates " +
          "the ANSI error of the distributed branch") }
  def mul(a: Long, b: Long): Long =
    try math.multiplyExact(a, b) catch { case _: ArithmeticException =>
      throw new ArithmeticException(
        "[ARITHMETIC_OVERFLOW] long overflow on multiplication — " +
          "replicates the ANSI error of the distributed branch") }
}
