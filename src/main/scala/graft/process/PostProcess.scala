package graft.process

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-matrix post-processor — the column-oriented second stage
  * (musiF `DataProcessor`, musif/process/processor.py:31-140): prune/merge
  * columns, NaN policies, stable ordering. Purely columnar: select-list
  * surgery + na.fill, no shuffle except an optional final sort.
  */
object PostProcess {

  /** P3: drop columns by name predicates (startswith/endswith/contains/
    * exact — musif/process/utils.py:78-126).
    */
  def deleteColumns(df: DataFrame,
                    exact: Seq[String] = Nil,
                    prefixes: Seq[String] = Nil,
                    suffixes: Seq[String] = Nil,
                    contains: Seq[String] = Nil): DataFrame = {
    val drop = df.columns.filter { c =>
      exact.contains(c) || prefixes.exists(c.startsWith) ||
        suffixes.exists(c.endsWith) || contains.exists(c.contains)
    }
    df.drop(drop: _*)
  }

  /** P4: drop rows whose null fraction exceeds the threshold
    * (processor.py:218-222). One pass, pure column math.
    */
  def dropSparseRows(df: DataFrame, maxNullFraction: Double): DataFrame = {
    val nullCount = df.columns.map(c => when(col(c).isNull, 1).otherwise(0))
      .reduce(_ + _)
    df.filter(nullCount <= lit(df.columns.length * maxNullFraction))
  }

  /** P5: drop columns whose null fraction exceeds the threshold
    * (process/utils.py:121-124): one aggregate pass → driver-side select
    * list (column count is small; row count is not).
    */
  def dropSparseColumns(df: DataFrame, maxNullFraction: Double): DataFrame = {
    val aggs = df.columns.map(c => sum(when(col(c).isNull, 1L).otherwise(0L)).as(c)) :+
      count(lit(1)).as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getAs[Long]("__n").toDouble
    val keep = df.columns.filter(c => row.getAs[Long](c) <= n * maxNullFraction)
    df.select(keep.map(col): _*)
  }

  /** G2: sum groups of columns into a new column
    * (join_part_degrees / join_keys, musif/process/utils.py:44-225).
    */
  def sumColumnGroup(df: DataFrame, outCol: String, cols: Seq[String]): DataFrame = {
    val present = cols.filter(df.columns.contains)
    require(present.nonEmpty, s"no columns of $cols present")
    df.withColumn(outCol, present.map(c => coalesce(col(c), lit(0.0))).reduce(_ + _))
  }

  /** G4: NaN/null replacement on name-matched columns
    * (replace_nans, processor.py:226-237).
    */
  def fillByPredicate(df: DataFrame, value: Double, pred: String => Boolean): DataFrame =
    df.na.fill(value, df.columns.filter(pred))

  /** O2/O5: lexicographic column order with priority keys first
    * (extract.py:366; sort_columns, common/sort.py:58-72).
    */
  def orderColumns(df: DataFrame, priority: Seq[String] = Seq("conv_id", "window_id")): DataFrame = {
    val pri = priority.filter(df.columns.contains)
    val rest = df.columns.filterNot(pri.contains).sorted
    df.select((pri ++ rest).map(col): _*)
  }

  /** A26: mix-with-precedent merge of two feature matrices over the same
    * keys — the musiF role-variant merge
    * (`_mix_data_with_precedent_data`, musif/extract/common.py:39-54):
    * per shared column —
    *   - string-typed ON EITHER SIDE → the precedent's value, null-filled
    *     from the new side (the reference keeps `prev` for non-numerics;
    *     checked before the name rules so a mixed-dtype '*max' column
    *     cannot hit an implicit-cast comparison);
    *   - name contains "max"/"highest" → the larger value (nulls lose);
    *   - name contains "min"/"lowest"  → the smaller value (nulls lose);
    *   - otherwise (numeric)           → mean of the two, null-coalescing.
    * Rows present on one side only pass through (full outer on `keys`);
    * columns present on one side only pass through unchanged. Null rules
    * are written as explicit CASEs (not greatest/least) so the DuckDB
    * oracle is the literal same expression.
    */
  def mergeWithPrecedent(prev: DataFrame, next: DataFrame,
                         keys: Seq[String] = Seq("conv_id")): DataFrame = {
    import org.apache.spark.sql.types.StringType
    val shared = prev.columns.filter(c => !keys.contains(c) && next.columns.contains(c))
    val onlyA = prev.columns.filter(c => !keys.contains(c) && !next.columns.contains(c))
    val onlyB = next.columns.filter(c => !keys.contains(c) && !prev.columns.contains(c))
    // alias-qualified references with the column name BACKTICKED inside
    // the dotted string (ADVICE r3: a bare col("__p.<name>") breaks for
    // names containing '.'). Aliases, not prev(c)/next(c) dataframe-apply:
    // apply carries dataset-id metadata that turns ambiguous when prev and
    // next share lineage (idempotent re-merge of the same matrix), while
    // alias qualification resolves either way.
    def bt(c: String): String = "`" + c.replace("`", "``") + "`"
    val j = prev.alias("__p").join(next.alias("__n"), keys, "full_outer")
    val merged = shared.map { c =>
      val lo = c.toLowerCase
      val pa = col(s"__p.${bt(c)}"); val pb = col(s"__n.${bt(c)}")
      // the string-precedent rule consults BOTH sides' dtypes (ADVICE r3:
      // a prev-numeric/next-string pair would hit the mean branch and fail
      // the double cast at runtime) — any string side means "non-numeric
      // feature": keep the precedent, reference semantics
      val anyString = prev.schema(c).dataType == StringType ||
        next.schema(c).dataType == StringType
      // anyString is checked BEFORE the name-based min/max branches
      // (ADVICE r4): a shared '*max'/'*min' column that is string on one
      // side and numeric on the other must hit the string-precedent rule,
      // not an implicit-cast >= comparison
      val out =
        if (anyString)
          coalesce(pa.cast("string"), pb.cast("string"))
        else if (lo.contains("max") || lo.contains("highest"))
          when(pa.isNull, pb).when(pb.isNull, pa).when(pa >= pb, pa).otherwise(pb)
        else if (lo.contains("min") || lo.contains("lowest"))
          when(pa.isNull, pb).when(pb.isNull, pa).when(pa <= pb, pa).otherwise(pb)
        else
          when(pa.isNull, pb).when(pb.isNull, pa)
            .otherwise((pa.cast("double") + pb.cast("double")) / 2.0)
      out.as(c)
    }
    j.select(keys.map(col) ++ merged.toSeq ++
      onlyA.toSeq.map(c => col(s"__p.${bt(c)}")) ++
      onlyB.toSeq.map(c => col(s"__n.${bt(c)}")): _*)
  }

  /** S8: merge two runs' feature matrices — musiF `merge_dataframes`
    * (process/utils.py:234-254): align on column names (missing columns
    * null-filled), drop rows without a key.
    */
  def mergeRuns(a: DataFrame, b: DataFrame, key: String = "conv_id"): DataFrame =
    a.unionByName(b, allowMissingColumns = true).filter(col(key).isNotNull)

  /** S6: export sinks — CSV for reference-workflow parity (musiF
    * DataProcessor.save, process/processor.py:239-270), parquet as the
    * native columnar path. Map/array columns must be exploded or rendered
    * before CSV (CSV is scalar-only), matching the reference's wide layout.
    */
  def saveCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def saveParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** G1 export explosion: render an open-set `map<key, count>` histogram
    * column as the reference's wide scalar columns (`prefix.py:64-126`
    * naming: one `<prefix><Key>` column per OBSERVED key, missing → 0).
    * The key vocabulary is collected driver-side — bounded by the label
    * alphabet (intervals/chords/tools), NOT by row count, the same
    * contract as the reference's dynamic column families. Keys are sorted
    * for a deterministic column order.
    */
  def explodeMapToColumns(df: DataFrame, mapCol: String, prefix: String,
                          fill: Long = 0L, maxKeys: Int = 1000): DataFrame = {
    def colName(k: String) =
      prefix + k.split("[^A-Za-z0-9]+").filter(_.nonEmpty)
        .map(w => w.head.toUpper + w.tail).mkString
    // the vocabulary fetch is capped BEFORE collect (limit maxKeys+1, not
    // collect-then-count): a free-text key column must fail loudly here,
    // not OOM the driver
    val fetched = df.select(explode(map_keys(col(mapCol))).as("k"))
      .distinct().limit(maxKeys + 1).collect().map(_.getString(0))
    require(fetched.length <= maxKeys,
      s"explodeMapToColumns($mapCol): key cardinality exceeds maxKeys=$maxKeys " +
        s"(> ${fetched.length - 1} distinct keys observed) — wide export is for " +
        "label-alphabet-bounded histograms, not free-text keys; raise maxKeys " +
        "only if the vocabulary is genuinely bounded")
    val keys = fetched.sortBy(colName)
    val wide = keys.map(k =>
      coalesce(element_at(col(mapCol), k), lit(fill)).as(colName(k)))
    df.select(df.columns.filterNot(_ == mapCol).map(col) ++ wide: _*)
  }

  /** Reference-style scope-prefixed export names
    * (musif/extract/features/prefix.py:4-126): `role_user_n_turns` →
    * `RoleUser_NTurns`-style rendering for users migrating from the
    * reference's wide CSV layout.
    */
  def renderReferenceNames(df: DataFrame): DataFrame = {
    def camel(s: String) = s.split("_").filter(_.nonEmpty)
      .map(w => w.head.toUpper + w.tail).mkString
    val renames = df.columns.map {
      case c if c == "conv_id" || c == "window_id" => c -> c
      case c if c.startsWith("role_") =>
        val rest = c.stripPrefix("role_")
        val (role, feat) = rest.span(_ != '_')
        c -> s"Role${camel(role)}_${camel(feat.stripPrefix("_"))}"
      case c => c -> s"Score_${camel(c)}"
    }
    renames.foldLeft(df) { case (d, (from, to)) =>
      if (from == to) d else d.withColumnRenamed(from, to)
    }
  }
}
