package graft.analyze

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.{EdgeKind, RelType}

/** A7+ — type-directed reference resolution for the JVM languages, the
  * DataFrame-era counterpart of the reference's per-language expression
  * resolvers (kotlin/expression_resolver.rs:103-1757 ~1.7 kLoC,
  * java/expression_resolver.rs ~830 LoC). Consumes the extractor's
  * [[graft.extract.RawTypeFact]] stream and resolves receiver-typed calls:
  *
  *  - local/field/param variable types (`val foo = Foo(); foo.foo()`)
  *  - receiver chains through fields and nested types
  *    (`myParameter.executor.execute()`, `Outer.Inner.innerStatic()`)
  *  - `super.m()` through declared supertype lists, `this.m()`
  *  - inherited methods via the supertype closure (Foo : Bar : Baz → baz())
  *  - companion-object members (`foo.companionFoo()` →
  *    Foo.Companion.companionFoo)
  *  - multi-branch initializer inference with least-upper-bound unification
  *    (`val p = when {...Admin()...User()}` → LUB(Admin, User) = Person)
  *  - call-chaining through return types (`f(x).getName()`), Kotlin
  *    operator desugaring (`(a + b).display()` → plus/display)
  *  - Kotlin extension functions/properties as a member-lookup fallback
  *  - unresolvable receivers/names that match an import → DEF_TO_IMP
  *    (`logger.info(...)` with `import org.slf4j.Logger` → the Logger
  *    imported symbol, the reference's find_calls_to_imported_symbol face)
  *
  * Scale shape: the type catalog (types, members, per-file scopes) is
  * collected and broadcast — O(class + import + fact count of the JVM
  * slice), the same per-repo state the reference keeps in memory for its
  * whole analysis; refs (the volume) stream through a mapPartitions against
  * the broadcast. A trillion-row corpus would partition the catalog by
  * package; the fixture-scale catalogs here are kilobytes.
  */
object TypedResolver {

  private val JvmLanguages = Set("java", "kotlin")

  private final case class TypeInfo(
      fqn: String, name: String, pkg: String, file: String, defId: Long,
      methods: Map[String, Long], nested: Map[String, String],
      fields: Map[String, String], supers: Seq[String])

  private final case class FileScope(
      pkg: String,
      imports: Map[String, (String, Long)], // name/alias -> (path, imp id)
      wildcardPkgs: Seq[String],
      funcs: Map[String, Long]) // top-level function name -> def id

  private final case class Catalog(
      types: Map[String, TypeInfo],
      byPkgName: Map[(String, String), String], // (pkg, simple) -> type fqn
      pkgFuncs: Map[(String, String), Long], // (pkg, name) -> func def id
      funcFqn: Map[Long, String], // def id -> fqn (functions)
      scopes: Map[String, FileScope],
      vars: Map[(String, String, String), String], // (file, scope, name) -> type expr
      props: Map[(String, String), String], // (recv simple name, prop) -> type expr
      returns: Map[(String, String), String]) { // (file, method fqn) -> type expr

    def superClosure(fqn: String): Set[String] = {
      val seen = scala.collection.mutable.Set[String]()
      def walk(t: String): Unit = if (!seen(t)) {
        seen += t
        types.get(t).foreach { ti =>
          ti.supers.flatMap(resolveSuper(ti, _)).foreach(walk)
        }
      }
      walk(fqn)
      seen.toSet
    }

    /** Resolve a raw supertype name in the subject type's own scope:
      * enclosing-scope nested members → imports → same package → wildcard
      * packages. A candidate that is the subject itself or one of its OWN
      * nested members is skipped (ServerFilter implements Filter, where the
      * nested Filter extends ServerFilter: javac resolves the header to the
      * top-level interface; taking the nested member would make the
      * hierarchy cyclic).
      */
    def resolveSuper(sub: TypeInfo, raw: String): Option[String] = {
      val cands = resolveTypePath(sub.file, sub.fqn, raw)
      cands.find(c => c != sub.fqn && !c.startsWith(sub.fqn + "."))
    }

    /** All candidate type FQNs for a (possibly dotted) type path, seen from
      * `scopeFqn` inside `file`, in lookup-precedence order.
      */
    def resolveTypePath(file: String, scopeFqn: String, path: String): Seq[String] = {
      val parts = path.split("\\.").toSeq.filter(_.nonEmpty)
      if (parts.isEmpty) return Nil
      val heads = resolveHeadType(file, scopeFqn, parts.head)
      parts.tail.foldLeft(heads) { (acc, p) =>
        acc.flatMap(t => nestedOf(t, p))
      }
    }

    private def nestedOf(fqn: String, n: String): Seq[String] =
      // nested member of the type or anywhere up its supertype closure
      superClosureLinear(fqn).flatMap(t => types.get(t).flatMap(_.nested.get(n)))

    private def superClosureLinear(fqn: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      val seen = scala.collection.mutable.Set[String]()
      def walk(t: String): Unit = if (!seen(t)) {
        seen += t; out += t
        types.get(t).foreach(ti => ti.supers.flatMap(resolveSuper(ti, _)).foreach(walk))
      }
      walk(fqn)
      out.toSeq
    }

    /** Simple type name → candidate FQNs in precedence order: enclosing
      * scopes' nested members (and the enclosing types themselves), explicit
      * imports, same package, wildcard-import packages.
      */
    def resolveHeadType(file: String, scopeFqn: String, n: String): Seq[String] = {
      val scope = scopes.getOrElse(file, FileScope("", Map.empty, Nil, Map.empty))
      val out = scala.collection.mutable.ArrayBuffer[String]()
      // enclosing chain: self-named + nested members
      var enc = scopeFqn
      while (enc.nonEmpty) {
        types.get(enc).foreach { ti =>
          if (ti.name == n) out += ti.fqn
          ti.nested.get(n).foreach(out += _)
        }
        enc = parentOf(enc)
      }
      scope.imports.get(n).foreach { case (p, _) =>
        if (types.contains(p)) out += p
      }
      byPkgName.get((scope.pkg, n)).foreach(out += _)
      scope.wildcardPkgs.foreach(wp => byPkgName.get((wp, n)).foreach(out += _))
      out.distinct.toSeq
    }

    def parentOf(fqn: String): String = {
      val i = fqn.lastIndexOf('.')
      if (i < 0) "" else fqn.substring(0, i)
    }

    /** Innermost enclosing TYPE of a definition fqn (the def itself if it
      * is a type).
      */
    def enclosingType(fqn: String): Option[String] = {
      var f = fqn
      while (f.nonEmpty && !types.contains(f)) f = parentOf(f)
      if (f.nonEmpty) Some(f) else None
    }

    /** Method member (or companion member / nested-type constructor) lookup
      * across the supertype closure. Returns (target def id, owner fqn).
      */
    def memberMethod(fqn: String, n: String): Option[Long] =
      superClosureLinear(fqn).iterator.flatMap { t =>
        types.get(t).flatMap { ti =>
          ti.methods.get(n)
            .orElse(ti.nested.get("Companion")
              .flatMap(c => types.get(c)).flatMap(_.methods.get(n)))
            .orElse(ti.nested.get(n).flatMap(nf => types.get(nf)).map(_.defId))
        }
      }.nextOption()

    def memberFieldType(fqn: String, n: String): Option[(String, String)] =
      // (raw type expr, declaring file) — var facts scoped to the type fqn
      superClosureLinear(fqn).iterator.flatMap { t =>
        types.get(t).flatMap(ti => ti.fields.get(n).map(e => (e, ti.file)))
      }.nextOption()
  }

  /** Resolve JVM-language refs. Returns (edges, resolvedSites) where
    * resolvedSites = (filePath, startByte, endByte) rows the heuristic
    * resolver should skip (typed resolution takes per-site precedence).
    */
  def resolve(spark: SparkSession, fileMeta: DataFrame, rawFacts: DataFrame,
              rawRefs: DataFrame, definitions: DataFrame,
              importedSymbols: DataFrame): (DataFrame, DataFrame) = {
    import spark.implicits._

    val jvmPaths = fileMeta.where(col("language").isin(JvmLanguages.toSeq: _*))
      .select(col("path").as("jvm_path"))
    if (jvmPaths.isEmpty) {
      val emptyEdges = spark.emptyDataset[EdgeRow].toDF()
      val emptySites = spark.emptyDataset[SiteRow].toDF()
      return (emptyEdges, emptySites)
    }

    // ---- catalog build (driver-side over the JVM slice; see scaladoc) ----
    val defRows = definitions.join(broadcast(jvmPaths),
        col("primary_file_path") === col("jvm_path"))
      .select("id", "fqn", "name", "definition_type", "primary_file_path")
      .collect()
    val factRows = rawFacts
      .select("filePath", "factKind", "scope", "subject", "detail").collect()
    val impRows = importedSymbols.join(broadcast(jvmPaths),
        col("file_path") === col("jvm_path"))
      .select("id", "import_type", "import_path", "name", "alias", "file_path")
      .collect()

    val pkgByFile = factRows.filter(_.getString(1) == "package")
      .map(r => r.getString(0) -> r.getString(4)).toMap
    val fieldFacts = factRows.filter(_.getString(1) == "var")
      .map(r => (r.getString(0), r.getString(2), r.getString(3)) -> r.getString(4))
      .toMap
    val extendsFacts = factRows.filter(_.getString(1) == "extends")
      .groupBy(_.getString(3)).map { case (fqn, rows) =>
        fqn -> rows.map(_.getString(4)).toSeq }
    val propFacts = factRows.filter(_.getString(1) == "prop")
      .map(r => (r.getString(2), r.getString(3)) -> r.getString(4)).toMap
    val returnFacts = factRows.filter(_.getString(1) == "returns")
      .map(r => (r.getString(0), r.getString(2)) -> r.getString(4)).toMap

    val typeKinds = Set("Class", "Interface", "Module")
    val typeDefs = defRows.filter(r => typeKinds(r.getString(3)))
    val typeFqns = typeDefs.map(_.getString(1)).toSet
    val methodsByParent = defRows.filter(r => !typeKinds(r.getString(3)))
      .groupBy { r => val f = r.getString(1); f.take(math.max(f.lastIndexOf('.'), 0)) }
    val nestedByParent = typeDefs
      .groupBy { r => val f = r.getString(1); f.take(math.max(f.lastIndexOf('.'), 0)) }

    val types = typeDefs.map { r =>
      val fqn = r.getString(1); val file = r.getString(4)
      val pkg = pkgByFile.getOrElse(file, "")
      val methods = methodsByParent.getOrElse(fqn, Array.empty)
        .map(m => m.getString(2) -> m.getLong(0)).toMap
      val nested = nestedByParent.getOrElse(fqn, Array.empty)
        .map(n => n.getString(2) -> n.getString(1)).toMap
      val fields = fieldFacts.collect {
        case ((f, scope, n), t) if f == file && scope == fqn => n -> t
      }.toMap
      fqn -> TypeInfo(fqn, r.getString(2), pkg, file, r.getLong(0),
        methods, nested, fields, extendsFacts.getOrElse(fqn, Nil))
    }.toMap

    val byPkgName = types.values
      .filter(ti => ti.fqn == (if (ti.pkg.isEmpty) ti.name else s"${ti.pkg}.${ti.name}"))
      .map(ti => (ti.pkg, ti.name) -> ti.fqn).toMap
    // top-level functions: fqn = pkg.name and not inside a type
    val funcDefs = defRows.filter { r =>
      !typeKinds(r.getString(3)) && {
        val fqn = r.getString(1); val file = r.getString(4)
        val pkg = pkgByFile.getOrElse(file, "")
        fqn == (if (pkg.isEmpty) r.getString(2) else s"$pkg.${r.getString(2)}")
      }
    }
    val pkgFuncs = funcDefs.map { r =>
      (pkgByFile.getOrElse(r.getString(4), ""), r.getString(2)) -> r.getLong(0)
    }.toMap
    val funcFqn = funcDefs.map(r => r.getLong(0) -> r.getString(1)).toMap

    val scopes = impRows.groupBy(_.getString(5)).map { case (file, rows) =>
      val named = rows.filter(_.getString(3) != "*").flatMap { r =>
        val key = Option(r.getString(4)).getOrElse(r.getString(3))
        Seq(key -> (r.getString(2), r.getLong(0)))
      }.toMap
      val wild = rows.filter(_.getString(3) == "*").map(_.getString(2)).toSeq
      file -> FileScope(pkgByFile.getOrElse(file, ""), named, wild,
        funcDefs.filter(_.getString(4) == file)
          .map(r => r.getString(2) -> r.getLong(0)).toMap)
    } ++ pkgByFile.keys.filterNot(impRows.map(_.getString(5)).contains).map { f =>
      f -> FileScope(pkgByFile.getOrElse(f, ""), Map.empty, Nil,
        funcDefs.filter(_.getString(4) == f)
          .map(r => r.getString(2) -> r.getLong(0)).toMap)
    }

    val catalog = Catalog(types, byPkgName, pkgFuncs, funcFqn, scopes.toMap,
      fieldFacts.map { case ((f, s, n), t) => (f, s, n) -> t },
      propFacts, returnFacts.map { case ((f, m), t) => (f, m) -> t })
    val bc = spark.sparkContext.broadcast(catalog)

    // ---- caller attribution: innermost enclosing definition ----
    val refs = rawRefs.join(broadcast(jvmPaths), col("filePath") === col("jvm_path"))
      .select(col("filePath").as("r_file"), col("name").as("r_name"),
        col("callReceiver").as("r_recv"), col("startByte").as("r_sb"),
        col("endByte").as("r_eb"), col("startLine").as("r_line"),
        col("startCol").as("r_sc"), col("endCol").as("r_ec"))
    val defsForScope = definitions.select(col("id").as("caller_id"),
      col("fqn").as("caller_fqn"), col("primary_file_path").as("d_file"),
      col("start_line").as("d_sl"), col("end_line").as("d_el"),
      col("primary_start_byte").as("d_sb"))
    // key includes r_recv: the chain pre-pass can emit a second ref at the
    // same site with a receiver expression — both must survive
    val innermost = Window
      .partitionBy(col("r_file"), col("r_sb"), col("r_eb"), col("r_recv"))
      .orderBy(col("d_sb").desc)
    val withCaller = refs.join(defsForScope,
        col("r_file") === col("d_file") &&
          col("r_line") >= col("d_sl") && col("r_line") <= col("d_el"))
      .withColumn("rk", row_number().over(innermost))
      .where(col("rk") === 1)
      .select("r_file", "r_name", "r_recv", "r_sb", "r_eb", "r_line",
        "r_sc", "r_ec", "caller_id", "caller_fqn")

    // ---- the resolution map (pure function of broadcast catalog) ----
    val resolved = withCaller
      .as[(String, String, String, Long, Long, Int, Int, Int, Long, String)]
      .mapPartitions { it =>
        val cat = bc.value
        it.flatMap { case (file, name, recv, sb, eb, line, sc, ec, callerId, callerFqn) =>
          val targets = resolveOne(cat, file, callerFqn, name, recv)
          val n = targets.size
          targets.map {
            case Left(defId) =>
              Resolved(file, sb, eb, line, sc, ec, callerId, EdgeKind.DefToDef, defId, n)
            case Right(impId) =>
              Resolved(file, sb, eb, line, sc, ec, callerId, EdgeKind.DefToImp, impId, n)
          }
        }
      }.toDF()

    val edges = resolved
      .select(col("kind"),
        when(col("nCands") > 1, RelType.AmbiguouslyCalls)
          .otherwise(RelType.Calls).as("type"),
        col("callerId").as("source_id"), col("targetId").as("target_id"),
        col("sb").as("source_start_byte"), col("eb").as("source_end_byte"),
        col("line").as("source_start_line"), col("line").as("source_end_line"),
        col("sc").as("source_start_col"), col("ec").as("source_end_col"))
      .where(col("source_id") =!= col("target_id"))
      .distinct()
    val sites = resolved.select(col("file").as("filePath"),
      col("sb").as("startByte"), col("eb").as("endByte")).distinct()
    (edges, sites)
  }

  private final case class EdgeRow(kind: String, `type`: String,
      source_id: Long, target_id: Long, source_start_byte: java.lang.Long,
      source_end_byte: java.lang.Long, source_start_line: java.lang.Integer,
      source_end_line: java.lang.Integer, source_start_col: java.lang.Integer,
      source_end_col: java.lang.Integer)
  private final case class SiteRow(filePath: String, startByte: Long, endByte: Long)

  // ------------------------------------------------------------ resolution
  private def resolveOne(cat: Catalog, file: String, callerFqn: String,
                         name: String, recv: String): Seq[Either[Long, Long]] = {
    val scope = cat.scopes.getOrElse(file,
      FileScope(cat.types.values.find(_.file == file).map(_.pkg).getOrElse(""),
        Map.empty, Nil, Map.empty))

    def varType(v: String): Option[String] = {
      var s = callerFqn
      var found: Option[String] = None
      while (found.isEmpty) {
        found = cat.vars.get((file, s, v))
        if (s.isEmpty) return found
        s = cat.parentOf(s)
        if (s.isEmpty && found.isEmpty) found = cat.vars.get((file, "", v))
          .orElse(cat.vars.get((file, scope.pkg, v)))
      }
      found
    }

    def lub(cands: Seq[String]): Seq[String] = {
      val resolvedTypes = cands.flatMap(c =>
        cat.resolveTypePath(file, callerFqn, c).headOption).distinct
      if (resolvedTypes.size <= 1) resolvedTypes
      else {
        val closures = resolvedTypes.map(cat.superClosure)
        val common = closures.reduce(_ intersect _)
        if (common.nonEmpty)
          // most-derived common supertypes
          common.filter(c => !common.exists(d =>
            d != c && cat.superClosure(d).contains(c) &&
              !cat.superClosure(c).contains(d))).toSeq.sorted
        else resolvedTypes
      }
    }

    def typeExprToTypes(expr: String, inFile: String, inScope: String): Seq[String] = {
      val cands = expr.split("\\|").toSeq.filter(_.nonEmpty)
      val resolvedAll = cands.flatMap(c =>
        resolveMemberishPath(inFile, inScope, c)).distinct
      if (resolvedAll.size <= 1) resolvedAll
      else {
        val closures = resolvedAll.map(cat.superClosure)
        val common = closures.reduce(_ intersect _)
        if (common.nonEmpty)
          common.filter(c => !common.exists(d =>
            d != c && cat.superClosure(d).contains(c) &&
              !cat.superClosure(c).contains(d))).toSeq.sorted
        else resolvedAll
      }
    }

    /** A dotted path that may traverse nested types and then non-type
      * members (enum constants): resolve the longest type prefix; unknown
      * trailing members keep the last resolved type
      * (`EnumClass.ENUM_VALUE_2` → EnumClass).
      */
    def resolveMemberishPath(inFile: String, inScope: String, path: String): Seq[String] = {
      val parts = path.split("\\.").toSeq.filter(_.nonEmpty)
      if (parts.isEmpty) return Nil
      var cur = cat.resolveHeadType(inFile, inScope, parts.head)
      if (cur.isEmpty) return Nil
      parts.tail.foreach { p =>
        val next = cur.flatMap(t => cat.types.get(t).flatMap(_.nested.get(p)))
        if (next.nonEmpty) cur = next
        // unknown member (enum constant / static field): type unchanged
      }
      cur
    }

    def memberOnTypes(ts: Seq[String], n: String): Seq[Either[Long, Long]] = {
      val hits = ts.flatMap(t => cat.memberMethod(t, n)).distinct
      if (hits.nonEmpty) hits.map(Left(_))
      else extensionFallback(n)
    }

    def extensionFallback(n: String): Seq[Either[Long, Long]] = {
      scope.funcs.get(n).map(id => Seq(Left(id): Either[Long, Long]))
        .orElse(scope.imports.get(n).collect {
          case (p, _) if cat.funcFqn.exists(_._2 == p) =>
            Seq(Left(cat.funcFqn.find(_._2 == p).get._1): Either[Long, Long])
        })
        .orElse(cat.pkgFuncs.get((scope.pkg, n))
          .map(id => Seq(Left(id): Either[Long, Long])))
        .orElse {
          val viaWild = scope.wildcardPkgs.flatMap(wp => cat.pkgFuncs.get((wp, n)))
          if (viaWild.nonEmpty) Some(viaWild.map(Left(_): Either[Long, Long]))
          else None
        }
        .getOrElse(Nil)
    }

    def bareCall(n: String): Seq[Either[Long, Long]] = {
      // enclosing type chain (methods, inherited, companions, nested ctors)
      var enc = cat.enclosingType(callerFqn)
      while (enc.isDefined) {
        val hit = cat.memberMethod(enc.get, n)
        if (hit.isDefined) return Seq(Left(hit.get))
        enc = Some(cat.parentOf(enc.get)).filter(_.nonEmpty)
          .flatMap(cat.enclosingType)
      }
      // same-file / same-package top-level functions
      scope.funcs.get(n).foreach(id => return Seq(Left(id)))
      cat.pkgFuncs.get((scope.pkg, n)).foreach(id => return Seq(Left(id)))
      // type by name (constructor call), imports, wildcard
      val t = cat.resolveHeadType(file, callerFqn, n)
      t.headOption.foreach(fqn => return Seq(Left(cat.types(fqn).defId)))
      scope.imports.get(n).foreach { case (_, impId) => return Seq(Right(impId)) }
      val wildFuncs = scope.wildcardPkgs.flatMap(wp => cat.pkgFuncs.get((wp, n)))
      if (wildFuncs.nonEmpty) return wildFuncs.map(Left(_))
      Nil
    }

    recv match {
      case "" => bareCall(name)
      case "super" =>
        cat.enclosingType(callerFqn).toSeq.flatMap { encT =>
          val ti = cat.types(encT)
          val supers = ti.supers.flatMap(cat.resolveSuper(ti, _))
          val hits = supers.flatMap(s => cat.memberMethod(s, name)).distinct
          hits.map(Left(_))
        }
      case "this" => cat.enclosingType(callerFqn).toSeq
        .flatMap(t => memberOnTypes(Seq(t), name))
      case r if r.startsWith("CALL:") =>
        val f = r.stripPrefix("CALL:")
        val fTargets = bareCall(f).collect { case Left(id) => id }
        val retTypes = fTargets.flatMap { id =>
          // the called function's declaring file scopes its return type
          val fqn = cat.funcFqn.get(id)
            .orElse(cat.types.values.flatMap(_.methods.find(_._2 == id))
              .map { case (n2, _) =>
                cat.types.values.find(_.methods.get(n2).contains(id)).map(t2 => s"${t2.fqn}.$n2")
              }.flatten.headOption)
          fqn.toSeq.flatMap { fq =>
            cat.returns.collect { case ((rf, rm), t) if rm == fq => (rf, t) }
              .flatMap { case (rf, t) => typeExprToTypes(t, rf, fq) }
          }
        }.distinct
        if (retTypes.isEmpty) Nil else memberOnTypes(lubIdentity(retTypes), name)
      case r if r.startsWith("BINOP:") =>
        val v = r.stripPrefix("BINOP:")
        val recvTypes = varType(v).toSeq.flatMap(typeExprToTypes(_, file, callerFqn))
        val plusIds = recvTypes.flatMap(t => cat.memberMethod(t, "plus"))
        val retTypes = plusIds.flatMap { id =>
          cat.types.values.find(_.methods.get("plus").contains(id)).toSeq
            .flatMap { owner =>
              cat.returns.get((owner.file, s"${owner.fqn}.plus")).toSeq
                .flatMap(typeExprToTypes(_, owner.file, owner.fqn))
            }
        }.distinct
        if (retTypes.isEmpty) Nil else memberOnTypes(retTypes, name)
      case chain =>
        val parts = chain.split("\\.").toSeq.filter(_.nonEmpty)
        if (parts.isEmpty) return bareCall(name)
        // when a var/field's declared type only matches an IMPORT (external
        // type: `val logger: Logger` with `import org.slf4j.Logger`), the
        // call resolves to the imported symbol — the reference's
        // find_calls_to_imported_symbol face
        var impFallback: Option[Long] = None
        def typesOfExpr(te: String, f2: String, s2: String): Seq[String] = {
          val ts = typeExprToTypes(te, f2, s2)
          if (ts.isEmpty && impFallback.isEmpty)
            impFallback = te.split("[.|]").headOption
              .flatMap(n => scope.imports.get(n).map(_._2))
          ts
        }
        // head: this / local var / enclosing field / type path / import
        var cur: Seq[String] = parts.head match {
          case "this" => cat.enclosingType(callerFqn).toSeq
          case h =>
            varType(h) match {
              case Some(te) => typesOfExpr(te, file, callerFqn)
              case None =>
                val viaField = cat.enclosingType(callerFqn).flatMap(t =>
                  cat.memberFieldType(t, h))
                viaField match {
                  case Some((te, declFile)) => typesOfExpr(te, declFile, "")
                  case None => cat.resolveHeadType(file, callerFqn, h).take(1)
                }
            }
        }
        if (cur.isEmpty) {
          // head unresolvable as a local type: a visible extension function
          // wins (externalType.print() → the same-file `fun ExternalType.
          // print()`), else an imported symbol receiver (or import-typed
          // var) resolves the call to the import
          val ext = extensionFallback(name)
          if (ext.nonEmpty) return ext
          return impFallback.orElse(scope.imports.get(parts.head).map(_._2))
            .map(impId => Seq(Right(impId): Either[Long, Long]))
            .getOrElse(Nil)
        }
        parts.tail.foreach { p =>
          val nested = cur.flatMap(t => cat.types.get(t).flatMap(_.nested.get(p)))
          if (nested.nonEmpty) cur = nested
          else {
            val viaField = cur.flatMap(t => cat.memberFieldType(t, p).toSeq
              .flatMap { case (te, declFile) => typeExprToTypes(te, declFile, "") })
            if (viaField.nonEmpty) cur = viaField
            else {
              val viaProp = cur.flatMap { t =>
                cat.types.get(t).toSeq.flatMap(ti =>
                  cat.props.get((ti.name, p)).toSeq
                    .flatMap(typeExprToTypes(_, file, callerFqn)))
              }
              if (viaProp.nonEmpty) cur = viaProp
              // else: unknown member (enum constant) — type unchanged
            }
          }
        }
        memberOnTypes(cur, name)
    }
  }

  private def lubIdentity(ts: Seq[String]): Seq[String] = ts
}

/** Resolution output row (top-level: Dataset encoders codegen cleanly for
  * top-level case classes; a nested private class falls back to interpreted
  * serialization with noisy janino errors).
  */
final case class Resolved(
    file: String, sb: Long, eb: Long, line: Int, sc: Int, ec: Int,
    callerId: Long, kind: String, targetId: Long, nCands: Int)
