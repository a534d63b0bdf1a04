package graft.core

/** Typed error hierarchy mirroring the reference's exception surface
  * (reference: src/data_preprocessing.py:655-677 — DataIOError,
  * MissingCRS, UnvalidatedPipeline, ColumnException), re-expressed as
  * a sealed Scala hierarchy. Column errors list the available columns,
  * which is part of the observable contract
  * (src/data_preprocessing.py:209-217).
  */
sealed abstract class EngineException(msg: String) extends RuntimeException(msg)

/** IO failure across the reader cascade (reference :444-458, :462-492). */
final case class DataIOError(path: String, detail: String)
    extends EngineException(s"Could not read data at '$path': $detail")

/** Operation requires a CRS but the input has none (reference :184-185). */
final case class MissingCRS(what: String)
    extends EngineException(s"Missing CRS on $what; set an EPSG code before spatial ops")

/** Pipeline used before a successful `run` validated it (reference :660-663). */
final case class UnvalidatedPipeline(name: String)
    extends EngineException(s"Pipeline '$name' has not been validated by a successful run")

/** A referenced column does not exist; lists what is available
  * (reference :209-217, :326, :672-677). */
final case class ColumnException(missing: Seq[String], available: Seq[String])
    extends EngineException(
      s"Column(s) ${missing.mkString(", ")} not found; available: ${available.mkString(", ")}")

/** An operator / aggregator name is not registered; lists what is
  * (the registry analog of ColumnException — a typo'd function name
  * should not read like a missing DataFrame column). */
final case class UnknownFunction(name: String, known: Seq[String])
    extends EngineException(
      s"No function or operator named '$name' is registered; known: ${known.mkString(", ")}")
