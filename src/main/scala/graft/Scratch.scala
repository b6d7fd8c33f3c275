package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEMPORARY r9 profiling harness — stage-level timings for the
  * similarity-join pipeline. Not registered; removed before round close. */
object Scratch {
  def time[T](tag: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    System.err.println(f"[scratch] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.local()
    import graft.Caches.Tracked
    Tables.load(spark, d, "lineitem").groupBy("l_returnflag").count().count()




    (1 to 0).foreach { round =>
      System.err.println(s"=== adj pass $round")
      val op = Tables.load(spark, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      time("op distinct")(op.count())
      val pairs = op.groupBy(col("l_orderkey"))
        .agg(expr("sort_array(collect_set(l_partkey))").as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                 y -> struct(x AS a, y AS b))))""")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n_ab"))
        .filter(col("n_ab") >= 2)
      val und = pairs.select(col("a"), col("b"))
      val adj = und.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
        .persistTracked()
      time("adj build+persist")(adj.count())
      System.err.println(s"[scratch] n_adj=${adj.count()}")
      val outdeg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      time("outdeg")(outdeg.count())
      Caches.release()
      Caches.sweepOrphans(spark, blocking = true)
    }

    (1 to 0).foreach { round =>
      System.err.println(s"=== q181 pass $round")
      val per = Tables.load(spark, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_d"),
          count(lit(1)).as("freq"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("money_c"))
        .persistTracked()
      time("per")(per.count())
      val anchor = per.agg(max(col("last_d")).as("max_d"))
      val base = per.crossJoin(broadcast(anchor))
        .select(col("o_custkey"),
          datediff(col("max_d"), col("last_d")).cast("long").as("recency_days"),
          col("freq"), col("money_c"))
      def quintile(df: org.apache.spark.sql.DataFrame,
          order: Seq[org.apache.spark.sql.Column], out: String) = {
        val ranked = graft.operators.GlobalOrder.withOrderedCumsum(
          df, order, lit(1L), "rk")
        val tot = ranked.agg(max(col("rk")).as("n"))
        ranked.crossJoin(broadcast(tot))
          .withColumn(out, graft.operators.GlobalOrder
            .ntileFromRank(col("rk"), col("n"), 5))
          .drop("rk", "n")
      }
      val withR = quintile(base,
        Seq(col("recency_days").desc, col("o_custkey")), "r_q")
      time("quintile R")(withR.count())
      val withF = quintile(withR,
        Seq(col("freq"), col("o_custkey")), "f_q")
      time("quintile RF")(withF.count())
      val withM = quintile(withF,
        Seq(col("money_c"), col("o_custkey")), "m_q")
      time("quintile RFM")(withM.count())
      val outd = withM.groupBy(col("r_q"), col("f_q"), col("m_q"))
        .agg(count(lit(1)).as("n_cust"))
      time("final")(outd.count())
      Caches.release()
      Caches.sweepOrphans(spark, blocking = true)
    }

    (1 to 0).foreach { round =>
      System.err.println(s"=== q427 pass $round")
      val op = Tables.load(spark, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
      val undirected = op.groupBy(col("l_orderkey"))
        .agg(expr("sort_array(collect_set(l_partkey))").as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
               transform(slice(ps, i + 2, size(ps)),
                 y -> struct(x AS a, y AS b))))""")).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b")).distinct()
        .localCheckpoint()
      time("undirected build")(undirected.count())
      System.err.println(s"[scratch] n_edges=${undirected.count()}")
      var edges = undirected
      def support(e: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        val adj = e.select(col("a").as("v"), col("b").as("w"))
          .unionAll(e.select(col("b").as("v"), col("a").as("w")))
          .groupBy(col("v"))
          .agg(expr("sort_array(collect_list(w))").as("nbrs"))
          .persistTracked()
        adj.select(col("v").as("a"), col("nbrs").as("na"),
            explode(col("nbrs")).as("b"))
          .filter(col("a") < col("b"))
          .join(graft.operators.Hints.autoBroadcast(
            adj.select(col("v").as("b"), col("nbrs").as("nb"))), Seq("b"))
          .select(col("a"), col("b"),
            size(array_intersect(col("na"), col("nb")))
              .cast("long").as("supp"))
      }
      (1 to 3).foreach { r =>
        val sup = support(edges).filter(col("supp") >= 2L)
        if (round == 1 && r == 1) {
          val pl = sup.queryExecution.executedPlan.toString
          System.err.println("[scratch] peel plan joins: " +
            pl.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange")).mkString(" || "))
        }
        val ck = time(s"peel $r")(sup.localCheckpoint())
        edges = ck.select(col("a"), col("b"))
        System.err.println(s"[scratch] peel $r edges=${edges.count()}")
      }
      Caches.release()
      Caches.sweepOrphans(spark, blocking = true)
    }

    (1 to 0).foreach { round =>
      System.err.println(s"=== q363 pass $round")
      val g = Tables.load(spark, d, "embeddings")
        .select(
          expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
            "x -> CAST(round(x * 16384) AS BIGINT))").as("qv"))
        .select(explode(expr(
          """flatten(transform(qv, (x, i) ->
               transform(slice(qv, i + 1, size(qv) - i),
                 (y, k) -> struct(i AS i, i + k AS j, x * y AS p))))"""))
          .as("t"))
        .groupBy(col("t.i").as("i"), col("t.j").as("j"))
        .agg(sum(col("t.p")).as("gij"))
        .persistTracked()
      time("gram upper")(g.count())
      val gFull = g
        .unionAll(g.filter(col("i") =!= col("j"))
          .select(col("j").as("i"), col("i").as("j"), col("gij")))
        .persistTracked()
      time("gram full")(gFull.count())
      var v = gFull.select(col("i")).distinct()
        .select(col("i"), lit(0.125).as("vi"))
      (1 to 3).foreach { it =>
        val w = gFull
          .join(v.select(col("i").as("j"), col("vi").as("vj")), Seq("j"))
          .withColumn("t", col("gij").cast("double") * col("vj"))
          .groupBy(col("i"))
          .agg(expr("aggregate(array_sort(collect_list(struct(j, t))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.t)").as("wi"))
        val nrm = w.agg(
          sqrt(expr("aggregate(array_sort(collect_list(struct(i, wi))), " +
            "CAST(0 AS DOUBLE), (acc, x) -> acc + x.wi * x.wi)")).as("nrm"))
        v = w.crossJoin(broadcast(nrm))
          .select(col("i"), (col("wi") / col("nrm")).as("vi"))
        time(s"iter $it")(v.count())
      }
      Caches.release()
      Caches.sweepOrphans(spark, blocking = true)
    }


    (1 to 2).foreach { round =>
      System.err.println(s"=== ndl pass $round")
      val docs = Tables.load(spark, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sz", size(col("toks")))
        .persistTrackedSer()
      time("docs")(docs.count())
      val pj = graft.queries.Dedup.jaccardPairs(docs, 0.6)
        .select(col("doc_a"), col("doc_b"))
      val pairs = time("jaccardPairs full")(pj.localCheckpoint())
      System.err.println(s"[scratch] n_pairs=${pairs.count()}")
      val labels = time("cc")(
        graft.operators.Components.connectedComponents(
          docs.select(col("doc_id").as("id")), pairs, tag = "scr"))
      time("cc count")(labels.count())
      Caches.release()
      Caches.sweepOrphans(spark, blocking = true)
    }

    (1 to 0).foreach { round =>
      System.err.println(s"=== jaccard pass $round")
      val docs = Tables.load(spark, d, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          array_distinct(split(col("text"), " ")).as("toks"))
        .withColumn("sz", size(col("toks")))
        .persistTrackedSer()
      time("docs build")(docs.count())
      val dfT = docs.select(explode(col("toks")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      time("dfTable")(dfT.count())
      val t = 0.6
      val prefixes = docs.select(
          col("doc_id"), col("lang"), col("source"),
          explode(col("toks")).as("tok"))
        .join(graft.operators.Hints.autoBroadcast(dfT), Seq("tok"))
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(expr("transform(sort_array(collect_list(struct(df, tok))), " +
          "s -> s.tok)").as("sorted_toks"))
        .withColumn(
          "prefix",
          expr(s"slice(sorted_toks, 1, size(sorted_toks) " +
            s"- CAST(ceil($t * size(sorted_toks)) AS INT) + 1)"))
        .select(col("doc_id"), col("lang"), col("source"),
          explode(col("prefix")).as("tok"))
      time("prefixRows")(prefixes.count())
      val candidates = prefixes
        .groupBy(col("lang"), col("source"), col("tok"))
        .agg(expr("sort_array(collect_set(doc_id))").as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(ids, (x, i) ->
               transform(slice(ids, i + 2, size(ids)),
                 y -> struct(x AS doc_a, y AS doc_b))))""")).as("p"))
        .select(col("p.doc_a"), col("p.doc_b"))
        .distinct()
        .localCheckpoint()
      time("candidates")(candidates.count())
      System.err.println(s"[scratch] n_candidates=${candidates.count()}")
      val sets = docs.select(col("doc_id"), col("toks"), col("sz"))
      val verified = candidates
        .join(sets.select(col("doc_id").as("doc_a"), col("toks").as("ta"),
          col("sz").as("la")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("toks").as("tb"),
          col("sz").as("lb")), Seq("doc_b"))
        .filter(least(col("la"), col("lb")).cast("double") >=
          greatest(col("la"), col("lb")) * t)
        .withColumn("inter", size(array_intersect(col("ta"), col("tb"))))
        .withColumn("jaccard", col("inter").cast("double") /
          (col("la") + col("lb") - col("inter")))
        .filter(col("jaccard") >= t)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      time("verify")(verified.count())
      Caches.release()
      Caches.sweepOrphans(spark, blocking = true)
    }
    spark.stop()
  }
}
