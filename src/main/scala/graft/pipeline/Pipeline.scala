package graft.pipeline

import org.apache.spark.sql.DataFrame
import scala.collection.immutable.ListMap
import graft.core.UnvalidatedPipeline

/** The pipeline framework (SURVEY.md C1-C11, X1): a named, JSON-
  * serializable list of operations executed left-to-right over a
  * DataFrame.
  *
  * Reference shape: `{'pipe': name, 'operations': [{'name','function',
  * 'args','kwargs'}, …]}` executed eagerly by `process`
  * (reference: src/data_preprocessing.py:22-150). Functions are
  * serialized by `__name__` (CustomEncoder :683-689); our analog is the
  * [[OpRegistry]] of named operator factories.
  *
  * Differences from the reference, on purpose:
  *  - immutable: every editor method returns a new Pipeline (the
  *    reference mutates a shared dict; C4-C7 notes);
  *  - `run` folds all ops into ONE lazy Catalyst plan — per-op "type
  *    check" becomes plan-time schema resolution, failing before any
  *    execution instead of mid-flight;
  *  - `popOperation` removes by name from the op list (the reference
  *    iterates the 2-key spec dict — a bug; SURVEY C5);
  *  - verbose logging (schema + 5-row head per op, reference :104-107)
  *    is opt-in because each head() is an action.
  */
final case class Operation(
    name: String,          // user-facing label for this step
    function: String,      // operator id resolved through OpRegistry
    params: ListMap[String, Json]) {

  def toJson: JObj = JObj(
    "name" -> JStr(name),
    "function" -> JStr(function),
    "kwargs" -> JObj(params))
}

object Operation {
  def apply(name: String, function: String, params: (String, Json)*): Operation =
    Operation(name, function, ListMap(params: _*))

  def fromJson(j: Json): Operation = j match {
    case o: JObj =>
      val params = o("kwargs") match {
        case JObj(m) => m
        case _ => ListMap.empty[String, Json]
      }
      Operation(o.str("name"), o.str("function"), params)
    case other => sys.error(s"operation must be an object, got $other")
  }
}

final case class Pipeline(
    name: String,
    operations: Vector[Operation] = Vector.empty,
    validated: Boolean = false) {

  // ---- C4-C7: spec editors (immutable; all invalidate) ----

  /** C4 — append an operation. */
  def addOperation(op: Operation): Pipeline =
    copy(operations = operations :+ op, validated = false)

  /** C5 — remove all ops with the given name (intended semantics). */
  def popOperation(opName: String): Pipeline =
    copy(operations = operations.filterNot(_.name == opName), validated = false)

  /** C6 — move the named op to `position`; error if absent
    * (reference raises, :82). */
  def moveOperation(opName: String, position: Int): Pipeline = {
    val idx = operations.indexWhere(_.name == opName)
    require(idx >= 0, s"no operation named '$opName' in pipeline '$name'")
    val op = operations(idx)
    val rest = operations.patch(idx, Nil, 1)
    val at = position.max(0).min(rest.length)
    copy(operations = rest.patch(at, Vector(op), 0), validated = false)
  }

  /** C7 — set one parameter of one op; silently no-op if the op is
    * absent (reference behavior, :84-90). */
  def setKwarg(opName: String, key: String, value: Json): Pipeline = {
    val ops = operations.map { op =>
      if (op.name == opName) op.copy(params = op.params + (key -> value)) else op
    }
    copy(operations = ops, validated = false)
  }

  // ---- C10: accessors ----
  def getPipe: Vector[Operation] = operations
  def getArgs(opName: String): Option[ListMap[String, Json]] =
    operations.find(_.name == opName).map(_.params)

  // ---- C8: run ----

  /** Fold every op into one lazy plan. `verbose` reproduces the
    * reference's per-op shape+head logging (:104-107) at the cost of an
    * action per op; `specOut` writes the provenance spec JSON on every
    * run (:117-125). Returns (result, validated pipeline). */
  def run(df: DataFrame,
      registry: OpRegistry = OpRegistry.default,
      verbose: Boolean = false,
      specOut: Option[String] = None): (DataFrame, Pipeline) = {
    val result = operations.foldLeft(df) { (d, op) =>
      if (verbose) {
        // schema is plan-time; count+show are deliberate debug actions
        println(s"[pipeline $name] applying '${op.name}' (${op.function}); " +
          s"schema=${d.schema.simpleString}")
        d.show(5, truncate = false)
      }
      registry(op.function)(op.params)(d)
    }
    specOut.foreach { dir =>
      val path = java.nio.file.Paths.get(dir, s"${name}_pipe.json")
      java.nio.file.Files.createDirectories(path.getParent)
      java.nio.file.Files.writeString(path, toJson.render)
    }
    (result, copy(validated = true))
  }

  /** C9 — parameter sweep: for each value, set the kwarg and run.
    * Returns the per-value results; callers sink them with the same
    * `pipe_result_<kwarg>_<value>` naming contract as the reference
    * (:145) via [[graft.io.Sinks]]. */
  def sweep(df: DataFrame, opName: String, kwarg: String, values: Seq[Json],
      registry: OpRegistry = OpRegistry.default): Seq[(Json, DataFrame)] =
    values.map { v => v -> setKwarg(opName, kwarg, v).run(df, registry)._1 }

  /** Guard analog of the reference's `_valid` flag (:660-663). */
  def requireValidated(): Unit =
    if (!validated) throw UnvalidatedPipeline(name)

  // ---- C2/C3: JSON codec ----
  def toJson: JObj = JObj(
    "pipe" -> JStr(name),
    "operations" -> JArr(operations.map(_.toJson: Json)))
}

object Pipeline {
  /** C2 — load a pipeline spec from JSON text. */
  def fromJson(text: String): Pipeline = Json.parse(text) match {
    case o: JObj =>
      val ops = o("operations") match {
        case JArr(xs) => xs.map(Operation.fromJson)
        case _ => Vector.empty[Operation]
      }
      Pipeline(o.str("pipe"), ops)
    case other => sys.error(s"pipeline spec must be an object, got $other")
  }

  def fromJsonFile(path: String): Pipeline =
    fromJson(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
}
