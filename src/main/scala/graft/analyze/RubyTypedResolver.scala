package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{EdgeKind, RelType}

/** A7+ for Ruby — the DataFrame-era counterpart of the reference's Ruby
  * resolver stack (`ruby/scope_resolver.rs` 635 LoC,
  * `ruby/expression_resolver.rs` 723, `ruby/type_map.rs` 331), mirroring
  * its Expression-Oriented Type Inference rules:
  *
  *  - constant receivers resolve globally to class/module definitions
  *    (`EmailService.send_welcome` — scope_resolver.rs resolve_constant),
  *    and the resolved constant itself becomes a CALLS edge on the class,
  *    exactly as the reference's per-symbol chain resolution does (its
  *    tests assert `User.new` / `User.find` produce callee == "User")
  *  - local variable types come ONLY from `X.new` assignments
  *    (type_map.rs infer_return_type: `.new` is the single certain case);
  *    any other assignment shadows the name without typing it
  *  - instance variables fall back to the ruby-lsp naming convention —
  *    `@user` → `User`, `@notification_service` → `NotificationService`
  *    (scope_resolver.rs infer_class_from_instance_variable)
  *  - bare identifiers and receiver-less call-forms resolve against the
  *    enclosing class's methods through the superclass chain (implicit
  *    self — resolve_method_on_current_scope), with assigned locals
  *    shadowing method names
  *  - the reference's framework-noise list (`render`, `params`,
  *    `validates`, …) is dropped, not resolved
  *    (expression_resolver.rs is_framework_method)
  *  - only Method/Function definitions can be callers
  *    (expression_resolver.rs:365-371 requires Method|SingletonMethod)
  *
  * Site-precedence contract matches [[TypedResolver]]: returned sites are
  * consumed — the heuristic resolver only sees the remainder, so unresolved
  * dotted refs still produce the PROPERTY_REFERENCE family and unresolved
  * call-forms keep their heuristic name-match behavior. IMPLICIT
  * (bare-identifier) sites are consumed whether or not they resolve: they
  * are lexically indistinguishable from local variable reads and must never
  * reach the name-match resolver.
  *
  * Scale shape: identical to [[TypedResolver]] — catalog inputs and refs
  * are tagged rows grouped by `repository_name`; one executor task per repo
  * builds that repo's catalog (classes, methods, var facts) in memory and
  * streams the repo's refs through it. Nothing is collected to the driver.
  */
object RubyTypedResolver {
  import CatRow.{TagDef, TagFact, TagRef}

  /** expression_resolver.rs:426-460 — Rails/ActiveRecord noise. */
  private val FrameworkMethods = Set(
    "present?", "blank?", "nil?", "respond_to?", "send", "instance_eval",
    "class_eval", "define_method", "attr_reader", "attr_writer",
    "attr_accessor", "validates", "belongs_to", "has_many", "has_one",
    "before_action", "after_action", "render", "redirect_to", "params",
    "request", "response", "session")

  private final case class RType(fqn: String, defId: Long,
      methods: Map[String, Long], superName: Option[String])

  private final case class Catalog(
      types: Map[String, RType],
      bySimple: Map[String, String],
      vars: Map[(String, String, String), String]) {

    def classOf(name: String): Option[RType] =
      types.get(name).orElse(
        bySimple.get(name.split("\\.").last).flatMap(types.get))

    /** Method lookup through the (in-repo) superclass chain. */
    def memberMethod(t: RType, m: String): Option[Long] = {
      var cur = Option(t); var depth = 0
      while (cur.isDefined && depth < 16) {
        cur.get.methods.get(m) match {
          case some @ Some(_) => return some
          case None =>
            cur = cur.get.superName.flatMap(classOf)
            depth += 1
        }
      }
      None
    }

    /** Innermost enclosing class/module of a definition fqn. */
    def enclosingType(fqn: String): Option[RType] = {
      var f = fqn
      while (f.nonEmpty && !types.contains(f)) {
        val i = f.lastIndexOf('.')
        f = if (i < 0) "" else f.substring(0, i)
      }
      types.get(f)
    }

    /** Variable type walking the scope chain outward; "?" = shadowed but
      * untyped.
      */
    def varType(file: String, scope: String, name: String): Option[String] = {
      var s = scope
      while (true) {
        vars.get((file, s, name)) match {
          case some @ Some(_) => return some
          case None =>
            if (s.isEmpty) return None
            val i = s.lastIndexOf('.')
            s = if (i < 0) "" else s.substring(0, i)
        }
      }
      None
    }
  }

  /** `@user_profile` → `UserProfile` (ruby-lsp TypeInferrer.guess_type, as
    * adopted by scope_resolver.rs:531-558).
    */
  private def pascalOfIvar(ivar: String): String =
    ivar.dropWhile(_ == '@').split("_").filter(_.nonEmpty)
      .map(w => w.head.toUpper + w.tail).mkString

  private final case class EdgeRow(kind: String, `type`: String,
      source_id: Long, target_id: Long, source_start_byte: java.lang.Long,
      source_end_byte: java.lang.Long, source_start_line: java.lang.Integer,
      source_end_line: java.lang.Integer, source_start_col: java.lang.Integer,
      source_end_col: java.lang.Integer)
  private final case class SiteRow(filePath: String, startByte: Long, endByte: Long)

  /** Resolve Ruby refs. Returns (edges, resolvedSites); sites are consumed
    * from the heuristic resolver's input.
    */
  def resolve(spark: SparkSession, fileMeta: DataFrame, rawFacts: DataFrame,
              rawRefs: DataFrame, definitions: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._

    val rubyFiles = fileMeta.where(col("language") === "ruby")
      .select(col("path").as("rb_path"), col("repositoryName").as("repo"))
    if (rubyFiles.isEmpty) {
      return (spark.emptyDataset[EdgeRow].toDF(),
        spark.emptyDataset[SiteRow].toDF())
    }
    // schema tolerance for pre-parsed tables from older producers
    val refsIn = Seq("receiver", "callReceiver").foldLeft(rawRefs) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(""))
    }

    val pad = Seq(lit("").as("s5"), lit(0L).as("sb"), lit(0L).as("eb"),
      lit(0).as("line"), lit(0).as("sc"), lit(0).as("ec"))
    // ---- tagged catalog rows (defs / facts), keyed by repo ----
    val defRows = definitions.join(broadcast(rubyFiles),
        col("primary_file_path") === col("rb_path"))
      .select(Seq(col("repo"), lit(TagDef).as("tag"), col("id"),
        col("fqn").as("s1"), col("name").as("s2"),
        col("definition_type").as("s3"), lit("").as("s4")) ++ pad: _*)
    val factRows = rawFacts.join(broadcast(rubyFiles),
        col("filePath") === col("rb_path"))
      .select(Seq(col("repo"), lit(TagFact).as("tag"), lit(0L).as("id"),
        col("filePath").as("s1"), col("factKind").as("s2"),
        col("scope").as("s3"), col("subject").as("s4"),
        col("detail").as("s5"), lit(0L).as("sb"), lit(0L).as("eb"),
        lit(0).as("line"), lit(0).as("sc"), lit(0).as("ec")): _*)

    // ---- caller attribution: innermost enclosing Method/Function ----
    val refs = refsIn.join(broadcast(rubyFiles), col("filePath") === col("rb_path"))
      .select(col("repo"), col("filePath").as("r_file"), col("name").as("r_name"),
        // call-form receiver wins over the property-access receiver
        when(col("callReceiver") =!= "", col("callReceiver"))
          .otherwise(col("receiver")).as("r_recv"),
        col("startByte").as("r_sb"), col("endByte").as("r_eb"),
        col("startLine").as("r_line"), col("startCol").as("r_sc"),
        col("endCol").as("r_ec"))
    val defsForScope = definitions.select(col("id").as("caller_id"),
      col("fqn").as("caller_fqn"), col("definition_type").as("caller_type"),
      col("primary_file_path").as("d_file"),
      col("start_line").as("d_sl"), col("end_line").as("d_el"),
      col("primary_start_byte").as("d_sb"))
    val innermost = Window
      .partitionBy(col("r_file"), col("r_sb"), col("r_eb"))
      .orderBy(col("d_sb").desc)
    val withCaller = refs.join(defsForScope,
        col("r_file") === col("d_file") &&
          col("r_line") >= col("d_sl") && col("r_line") <= col("d_el"))
      .withColumn("rk", row_number().over(innermost))
      .where(col("rk") === 1 && col("caller_type").isin("Method", "Function"))
    val refRows = withCaller.select(col("repo"), lit(TagRef).as("tag"),
      col("caller_id").as("id"), col("r_file").as("s1"),
      col("r_name").as("s2"), col("r_recv").as("s3"),
      col("caller_fqn").as("s4"), lit("").as("s5"), col("r_sb").as("sb"),
      col("r_eb").as("eb"), col("r_line").as("line"), col("r_sc").as("sc"),
      col("r_ec").as("ec"))

    // ---- per-repo grouped resolution (see TypedResolver for the shape) ----
    val resolved = Seq(defRows, factRows, refRows)
      .reduce(_.unionByName(_)).as[CatRow]
      .groupByKey(_.repo)
      .flatMapSortedGroups(col("tag")) { (_: String, it: Iterator[CatRow]) =>
        val defs = scala.collection.mutable.ArrayBuffer[(Long, String, String, String)]()
        val facts = scala.collection.mutable.ArrayBuffer[(String, String, String, String, String)]()
        var cat: Catalog = null
        it.flatMap { r =>
          r.tag match {
            case TagDef => defs += ((r.id, r.s1, r.s2, r.s3)); Iterator.empty
            case TagFact => facts += ((r.s1, r.s2, r.s3, r.s4, r.s5)); Iterator.empty
            case _ =>
              if (cat == null) cat = buildCatalog(defs.toSeq, facts.toSeq)
              val (targets, consumed) = resolveOne(cat, r.s1, r.s4, r.s2, r.s3)
              if (targets.isEmpty && consumed)
                // site consumed with no edge (e.g. shadowed local): a single
                // marker row keeps it out of the heuristic pass
                Iterator.single(RubyResolved(r.s1, r.sb, r.eb, r.line, r.sc,
                  r.ec, r.id, -1L, consumed = true))
              else targets.iterator.map(t =>
                RubyResolved(r.s1, r.sb, r.eb, r.line, r.sc, r.ec, r.id, t,
                  consumed))
          }
        }
      }.toDF()

    val edges = resolved.where(col("targetId") >= 0)
      .select(lit(EdgeKind.DefToDef).as("kind"), lit(RelType.Calls).as("type"),
        col("callerId").as("source_id"), col("targetId").as("target_id"),
        col("sb").as("source_start_byte"), col("eb").as("source_end_byte"),
        col("line").as("source_start_line"), col("line").as("source_end_line"),
        col("sc").as("source_start_col"), col("ec").as("source_end_col"))
      .where(col("source_id") =!= col("target_id"))
      .distinct()
    val sites = resolved.where(col("consumed"))
      .select(col("file").as("filePath"), col("sb").as("startByte"),
        col("eb").as("endByte")).distinct()
    (edges, sites)
  }

  /** One repo's catalog from its (id, fqn, name, defType) defs and
    * (file, kind, scope, subject, detail) facts, built task-side.
    */
  private def buildCatalog(defRows: Seq[(Long, String, String, String)],
      factRows: Seq[(String, String, String, String, String)]): Catalog = {
    val typeKinds = Set("Class", "Module")
    val extendsFacts = factRows.filter(_._2 == "extends")
      .map(f => f._4 -> f._5).toMap
    val methodsByParent = defRows.filterNot(d => typeKinds(d._4))
      .groupBy { d => val f = d._2; f.take(math.max(f.lastIndexOf('.'), 0)) }
    val types = defRows.filter(d => typeKinds(d._4)).map { d =>
      val fqn = d._2
      fqn -> RType(fqn, d._1,
        methodsByParent.getOrElse(fqn, Nil).map(m => m._3 -> m._1).toMap,
        extendsFacts.get(fqn))
    }.toMap
    // simple name → fqn; ties broken by lowest def id (deterministic, the
    // reference's interned definition map keeps one winner too)
    val bySimple = types.values.groupBy(_.fqn.split("\\.").last)
      .map { case (n, ts) => n -> ts.minBy(_.defId).fqn }
    val vars = factRows.filter(_._2 == "var")
      .map(f => (f._1, f._3, f._4) -> f._5).toMap
    Catalog(types, bySimple, vars)
  }

  /** One ref → (target def ids, consume site?). Mirrors
    * expression_resolver.rs resolve_symbol_chain for the two-symbol
    * receiver.method shape (deeper chains stay unresolved: return types
    * other than `.new` are Unknown, type_map.rs:518-529).
    */
  private def resolveOne(cat: Catalog, file: String, callerFqn: String,
                         name: String, recv: String): (Seq[Long], Boolean) = {

    def methodEdge(t: RType): Seq[Long] =
      if (name == "new" || FrameworkMethods(name)) Nil
      else cat.memberMethod(t, name).toSeq

    if (recv.isEmpty || recv == "IMPLICIT") {
      // implicit self: enclosing class methods via the super chain, locals
      // shadow (resolve_identifier checks the variable map first)
      val implicitOnly = recv == "IMPLICIT"
      if (FrameworkMethods(name) ||
          cat.varType(file, callerFqn, name).isDefined)
        return (Nil, implicitOnly)
      val target = cat.enclosingType(callerFqn)
        .flatMap(t => cat.memberMethod(t, name))
      (target.toSeq, implicitOnly || target.isDefined)
    } else if (recv.contains(".") && !recv.replace("::", ".").split("\\.")
        .forall(p => p.nonEmpty && p.head.isUpper)) {
      // multi-part lowercase chain (`user.profile.x`, `@users.first`):
      // return types are Unknown beyond `.new` — leave to the heuristic
      (Nil, false)
    } else if (recv.head.isUpper) {
      // constant receiver: global class lookup; the constant resolution is
      // itself a CALLS edge on the class, plus the member method if found
      cat.classOf(recv.replace("::", ".")) match {
        case Some(t) => (t.defId +: methodEdge(t), true)
        case None => (Nil, false)
      }
    } else if (recv.head == '@') {
      // instance variable: concrete `.new` fact, else naming convention
      val typeName = cat.varType(file, callerFqn, recv).filter(_ != "?")
        .getOrElse(pascalOfIvar(recv))
      cat.classOf(typeName) match {
        case Some(t) => (t.defId +: methodEdge(t), true)
        case None => (Nil, false)
      }
    } else {
      // local variable receiver: `.new`-typed only
      cat.varType(file, callerFqn, recv).filter(_ != "?") match {
        case Some(tn) => cat.classOf(tn) match {
          case Some(t) => (t.defId +: methodEdge(t), true)
          case None => (Nil, false)
        }
        case None => (Nil, false)
      }
    }
  }
}

/** Ruby resolution output row. Top-level for the same encoder-codegen reason
  * as [[Resolved]]: a private nested case class makes Janino's generated
  * accessor calls (`Resolved.consumed()`) fail to compile, and every Ruby
  * resolution pass silently falls back to interpreted execution.
  */
final case class RubyResolved(
    file: String, sb: Long, eb: Long, line: Int, sc: Int, ec: Int,
    callerId: Long, targetId: Long, consumed: Boolean)
