package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONPath over TYPED columns, compiled to Catalyst expressions.
  *
  * The reference filters messages with jsonpath-ng expressions in
  * `filter_field_path` (reference: firebase/app/artifacts.py:345-358
  * feeding the SDK's FilterConfig; schema
  * firebase/app/fixtures/schemas.py:241-249; requirements pin
  * jsonpath-ng==1.4.3 + eha-jsonpath, conf/pip/requirements.txt:26,48).
  * Messages there are Python dicts; here they are decoded struct
  * columns, so a path compiles AT PLAN TIME against the static schema
  * into pure projections/lambdas — no per-row path interpretation, no
  * UDF, and Catalyst collapses simple paths (`a.b.c`) into ordinary
  * nested-field references that push down to the scan.
  *
  * Supported subset (of jsonpath-ng + ext filters):
  *   `$` root (optional) · `.field` / `['field']` · `.*` / `[*]`
  *   wildcard (struct fields, map values, or array elements) · `[n]`
  *   index (0-based, negative from end) · `[a:b]` slices (non-negative
  *   bounds) · `..field` recursive descent (schema-driven, pre-order)
  *   · `[?(@.path <op> literal)]` with ==, !=, >=, <=, >, < and
  *   string/number/boolean/null literals · `[?(@.path)]` existence.
  *   Field steps over string-keyed `MapType` (the shape Avro `map`
  *   payloads decode to) are key lookups — a missing key is a no-match,
  *   matching jsonpath-ng over Python dicts.
  * Unsupported (throws at parse): unions `[a,b]`, stepped slices,
  * `..*`, nested subqueries.
  *
  * Match semantics follow jsonpath-ng: a step over a value of the
  * wrong shape (field on a non-struct, index on a non-array) yields no
  * match; out-of-range indexes and null values are dropped from the
  * match set.
  */
object JsonPath {

  sealed trait Step
  final case class Field(name: String) extends Step
  final case class RecField(name: String) extends Step
  case object Wild extends Step
  final case class Index(i: Int) extends Step
  final case class Slice(from: Option[Int], until: Option[Int]) extends Step
  final case class Pred(atPath: Seq[String], op: String, value: Option[Any]) extends Step
  /** JSON null literal in a predicate (`== null`). */
  case object JNull

  // ---------------------------------------------------------------- parse

  def parse(path: String): Seq[Step] = {
    val s0 = path.trim
    val s = if (s0.startsWith("$")) s0.drop(1) else s0
    val steps = Seq.newBuilder[Step]
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '-'
    def readIdent(from: Int): (String, Int) = {
      var j = from
      while (j < s.length && isIdent(s(j))) j += 1
      require(j > from, s"jsonpath: expected a field name at offset $from in '$path'")
      (s.substring(from, j), j)
    }
    var i = 0
    if (i < s.length && isIdent(s(i))) { // leading bare field: "a.b.c"
      val (name, j) = readIdent(i); steps += Field(name); i = j
    }
    while (i < s.length) {
      s(i) match {
        case '.' if i + 1 < s.length && s(i + 1) == '.' =>
          val (name, j) = readIdent(i + 2); steps += RecField(name); i = j
        case '.' if i + 1 < s.length && s(i + 1) == '*' =>
          steps += Wild; i += 2
        case '.' =>
          val (name, j) = readIdent(i + 1); steps += Field(name); i = j
        case '[' =>
          val close = matchingBracket(s, i, path)
          steps += bracketStep(s.substring(i + 1, close).trim, path)
          i = close + 1
        case c =>
          throw new IllegalArgumentException(
            s"jsonpath: unexpected '$c' at offset $i in '$path'")
      }
    }
    steps.result()
  }

  private def matchingBracket(s: String, open: Int, path: String): Int = {
    var depth = 0; var j = open; var quote: Char = 0
    while (j < s.length) {
      val c = s(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' => quote = c
        case '[' => depth += 1
        case ']' => depth -= 1; if (depth == 0) return j
        case _ =>
      }
      j += 1
    }
    throw new IllegalArgumentException(s"jsonpath: unbalanced '[' in '$path'")
  }

  private def bracketStep(inner: String, path: String): Step = inner match {
    case "*" => Wild
    case q if q.length >= 2 && (q.head == '\'' || q.head == '"') && q.last == q.head =>
      Field(q.substring(1, q.length - 1))
    case p if p.startsWith("?") => parsePred(p.drop(1).trim, path)
    case sl if sl.contains(':') =>
      val parts = sl.split(":", -1)
      require(parts.length == 2, s"jsonpath: stepped slices unsupported in '$path'")
      def side(x: String) = x.trim match { case "" => None; case v => Some(v.toInt) }
      val (a, b) = (side(parts(0)), side(parts(1)))
      require(a.forall(_ >= 0) && b.forall(_ >= 0),
        s"jsonpath: negative slice bounds unsupported in '$path'")
      Slice(a, b)
    case n =>
      try Index(n.toInt)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"jsonpath: cannot parse step [$n] in '$path'")
      }
  }

  private def parsePred(raw0: String, path: String): Pred = {
    val raw =
      if (raw0.startsWith("(") && raw0.endsWith(")")) raw0.substring(1, raw0.length - 1).trim
      else raw0
    require(raw.startsWith("@."), s"jsonpath: predicate must start with '@.' in '$path'")
    // earliest operator OUTSIDE quoted regions (a quoted literal may
    // itself contain '==' etc.); longest op wins at a given offset
    val ops = Seq("==", "!=", ">=", "<=", ">", "<")
    var at = -1; var opHit: String = null
    var j = 0; var quote: Char = 0
    while (j < raw.length && at < 0) {
      val c = raw(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '\'' || c == '"') quote = c
      else ops.find(op => raw.startsWith(op, j)).foreach { op => at = j; opHit = op }
      j += 1
    }
    if (at < 0) Pred(raw.drop(2).trim.split('.').toSeq, "exists", None)
    else {
      val fieldPart = raw.substring(2, at).trim
      val litPart = raw.substring(at + opHit.length).trim
      Pred(fieldPart.split('.').toSeq, opHit, Some(parseLit(litPart, path)))
    }
  }

  private def parseLit(t: String, path: String): Any = t match {
    case q if q.length >= 2 && (q.head == '\'' || q.head == '"') && q.last == q.head =>
      q.substring(1, q.length - 1)
    case "true"  => true
    case "false" => false
    case "null"  => JNull
    case n =>
      try n.toDouble
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(s"jsonpath: cannot parse literal '$n' in '$path'")
      }
  }

  // -------------------------------------------------------------- compile

  /** One match-set node: `col` evaluates to the match (scalar or
    * complex) of type `dt`; if `many`, `col` is an ARRAY of `dt`
    * holding zero or more matches per row. */
  final case class Node(col: Column, dt: DataType, many: Boolean)

  /** Compile `path` against a row `schema` to its static match set. */
  def nodes(schema: StructType, path: String): Seq[Node] = {
    // SimplifyExtractValueOps collapses struct(cols).getField(f) back to
    // the bare column, so the synthetic root costs nothing after optimize
    val root = Node(struct(schema.fieldNames.toIndexedSeq.map(col): _*), schema, many = false)
    parse(path).foldLeft(Seq(root))((ns, st) => ns.flatMap(one(_, st)))
  }

  private def one(n: Node, s: Step): Seq[Node] = s match {
    case Field(f)    => fieldOf(n, f)
    case RecField(f) => recurse(n, f)
    case Wild => n.dt match {
      case at: ArrayType =>
        if (!n.many) Seq(Node(n.col, at.elementType, many = true))
        else Seq(Node(flatten(n.col), at.elementType, many = true))
      case st: StructType => st.fields.toSeq.flatMap(fd => fieldOf(n, fd.name))
      case mt: MapType =>
        if (!n.many) Seq(Node(map_values(n.col), mt.valueType, many = true))
        else Seq(Node(flatten(transform(n.col, x => map_values(x))), mt.valueType, many = true))
      case _ => Nil
    }
    case Index(i) =>
      // try_element_at: 1-based, negative from end, NULL (dropped) when
      // out of range — plain element_at throws under ANSI semantics
      val idx = if (i >= 0) i + 1 else i
      n.dt match {
        case at: ArrayType =>
          if (!n.many) Seq(Node(try_element_at(n.col, lit(idx)), at.elementType, many = false))
          else Seq(Node(transform(n.col, x => try_element_at(x, lit(idx))), at.elementType, many = true))
        case _ => Nil
      }
    case Slice(a, b) => n.dt match {
      case at: ArrayType =>
        val start = a.getOrElse(0)
        def sl(c: Column): Column = b match {
          case Some(e) => slice(c, start + 1, math.max(e - start, 0))
          case None    => slice(c, lit(start + 1), greatest(size(c) - start, lit(0)))
        }
        val sliced = if (!n.many) sl(n.col) else flatten(transform(n.col, x => sl(x)))
        Seq(Node(sliced, at.elementType, many = true))
      case _ => Nil
    }
    case Pred(fpath, op, v) => n.dt match {
      case at: ArrayType if at.elementType.isInstanceOf[StructType] ||
          at.elementType.isInstanceOf[MapType] =>
        val base = if (!n.many) n.col else flatten(n.col)
        Seq(Node(filter(base, x => predCol(x, at.elementType, fpath, op, v)),
          at.elementType, many = true))
      case _ => Nil
    }
  }

  private def fieldOf(n: Node, f: String): Seq[Node] = n.dt match {
    case st: StructType if st.fieldNames.contains(f) =>
      val fd = st(f)
      if (!n.many) Seq(Node(n.col.getField(f), fd.dataType, many = false))
      else Seq(Node(transform(n.col, x => x.getField(f)), fd.dataType, many = true))
    case mt: MapType if mt.keyType == StringType =>
      // Avro maps decode to MapType; jsonpath-ng matches dict keys, so
      // a field step is a (missing ⇒ no-match) key lookup
      if (!n.many) Seq(Node(try_element_at(n.col, lit(f)), mt.valueType, many = false))
      else Seq(Node(transform(n.col, x => try_element_at(x, lit(f))), mt.valueType, many = true))
    case _ => Nil // field step on an array/scalar: no match (as jsonpath-ng)
  }

  /** `..f`: pre-order over the static schema — a direct `f` here, then
    * recursion into every struct field and array element. */
  private def recurse(n: Node, f: String): Seq[Node] = {
    val here = fieldOf(n, f)
    val deeper = n.dt match {
      case st: StructType =>
        st.fields.toSeq.flatMap(fd => fieldOf(n, fd.name)).flatMap(recurse(_, f))
      case at: ArrayType =>
        val elems =
          if (!n.many) Node(n.col, at.elementType, many = true)
          else Node(flatten(n.col), at.elementType, many = true)
        recurse(elems, f)
      case mt: MapType =>
        // descend into every map value (schema gives one value type)
        val vals =
          if (!n.many) Node(map_values(n.col), mt.valueType, many = true)
          else Node(flatten(transform(n.col, x => map_values(x))), mt.valueType, many = true)
        recurse(vals, f)
      case _ => Nil
    }
    here ++ deeper
  }

  private def resolve(dt: DataType, path: Seq[String]): Option[DataType] =
    path.foldLeft(Option(dt)) {
      case (Some(st: StructType), f) => st.find(_.name == f).map(_.dataType)
      case (Some(mt: MapType), _) if mt.keyType == StringType => Some(mt.valueType)
      case _ => None
    }

  private def predCol(x: Column, st: DataType, fpath: Seq[String],
                      op: String, v: Option[Any]): Column =
    resolve(st, fpath) match {
      case None => lit(false) // field absent from the schema: never matches
      case Some(_) =>
        val target = fpath.foldLeft(x -> (st: DataType)) { case ((c, dt), f) =>
          dt match {
            case s: StructType => c.getField(f) -> s(f).dataType
            case m: MapType    => try_element_at(c, lit(f)) -> m.valueType
            case other         => c.getField(f) -> other // unreachable post-resolve
          }
        }._1
        (op, v) match {
          case ("exists", _)      => target.isNotNull
          case ("==", Some(JNull)) => target.isNull
          case ("!=", Some(JNull)) => target.isNotNull
          case (_, Some(value)) =>
            val (l, r) = value match {
              case d: Double  => (target.cast("double"), lit(d))
              case b: Boolean => (target.cast("boolean"), lit(b))
              case s: String  => (target.cast("string"), lit(s))
              case other => throw new IllegalStateException(s"unexpected literal $other")
            }
            op match {
              case "==" => l === r
              case "!=" => l =!= r
              case ">"  => l > r
              case ">=" => l >= r
              case "<"  => l < r
              case "<=" => l <= r
            }
          case _ => lit(false)
        }
    }

  // ------------------------------------------------------------ consumers

  /** The reference's pass check: true iff ANY matched SCALAR value,
    * rendered as a string, is in `passValues` (the SDK's
    * `result in pass_conditions` over config-file scalars — complex
    * matches can never equal a scalar pass value). */
  def passPredicate(schema: StructType, path: String, passValues: Seq[String]): Column = {
    val preds = nodes(schema, path).flatMap { n =>
      n.dt match {
        case _: StructType | _: ArrayType | _: MapType => None
        case _ =>
          Some(
            if (n.many) exists(n.col, x => x.cast("string").isin(passValues: _*))
            else n.col.cast("string").isin(passValues: _*))
      }
    }
    // no/null matches ⇒ false, never null (jsonpath: nothing matched)
    coalesce(preds.reduceOption(_ || _).getOrElse(lit(false)), lit(false))
  }

  /** All matched values as strings (complex values as JSON), null/
    * missing matches dropped — the golden-vector comparison surface. */
  def matchStrings(schema: StructType, path: String): Column = {
    val parts = nodes(schema, path).map { n =>
      def str(c: Column): Column = n.dt match {
        case _: StructType | _: ArrayType | _: MapType => to_json(c)
        case _ => c.cast("string")
      }
      if (n.many) transform(n.col, x => str(x)) else array(str(n.col))
    }
    // a null node array (e.g. a path through a null struct) must not
    // poison the concat — it is simply zero matches
    val empty = array().cast("array<string>")
    val safe = parts.map(p => coalesce(p, empty))
    val all =
      if (safe.isEmpty) empty
      else if (safe.size == 1) safe.head
      else concat(safe: _*)
    filter(all, x => x.isNotNull)
  }
}
