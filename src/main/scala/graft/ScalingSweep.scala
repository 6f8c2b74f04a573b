package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synthetic scale-stress sweep (r15 ask #4): measure how the heavy
  * operator families actually scale when the corpus grows ~10×,
  * instead of arguing it from plan reads. Max local testdata is sf0.1
  * (17 MB), so the 10× corpus is SYNTHESIZED deterministically from
  * id-shifted replicas of sf0.1 — constructed so each replica keeps
  * the original's internal structure while replicas stay DISJOINT
  * where global collisions would change the workload's shape rather
  * than its size:
  *
  *  - documents: replica r > 0 suffixes every token with `zr`
  *    (vocabulary renaming) — per-replica shingle/gram/near-dup
  *    structure is preserved exactly, and cross-replica LSH buckets
  *    cannot collide (a bare 10-way text clone would make EVERY
  *    bucket 10× denser and measure quadratic pair blowup that says
  *    "the corpus is 90% duplicates", not "the operator scales");
  *  - embeddings: replica r rotates the vector by r dimensions —
  *    norms and intra-replica geometry are untouched, and rotations
  *    of high-dimensional vectors are near-orthogonal, so cells grow
  *    in count, not density;
  *  - events/lineitem: pure id shifts (per-user / per-order structure
  *    is already local to the key).
  *
  * Per family: min-of-2 wall seconds at 1× and 10× through the
  * Bench discipline (caches dropped before every timed run,
  * `toRdd.count()` so no column prunes away), and the fitted
  * exponent log10(t10/t1). Families at sf0.1-scale carry real
  * scheduler floor (~0.3-0.5 s), which biases exponents LOW — the
  * sweep's alarm threshold is exponents >1.5 (the r15 ask), not
  * precision below 1. Emits one JSON object (committed as
  * SCALING.json).
  */
object ScalingSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "SCALING.json"
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("WARN")
    val Shift = 10000000L

    def replicate(base: DataFrame, k: Int)(mk: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until k).map(r => mk(base, r)).reduce(_ unionByName _)

    def docsAt(k: Int): DataFrame =
      replicate(Tables.documents(spark, sfDir), k) { (d, r) =>
        d.select((col("doc_id") + lit(r * Shift)).as("doc_id"),
          (if (r == 0) col("text")
           else regexp_replace(col("text"), "(\\S+)", s"$$1z$r")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }

    def embAt(k: Int): DataFrame =
      replicate(Tables.embeddings(spark, sfDir), k) { (e, r) =>
        e.select((col("vec_id") + lit(r * Shift)).as("vec_id"),
          (if (r == 0) col("embedding")
           else expr(s"concat(slice(embedding, ${r + 1}, size(embedding) - $r), " +
             s"slice(embedding, 1, $r))")).as("embedding"),
          col("label"))
      }

    def eventsAt(k: Int): DataFrame =
      replicate(Tables.events(spark, sfDir), k) { (e, r) =>
        e.select((col("event_id") + lit(r * Shift)).as("event_id"),
          unix_micros(col("ts")).as("us"),
          (col("user_id") + lit(r * Shift)).as("user_id"),
          col("event_type"))
      }

    def itemsAt(k: Int): DataFrame =
      replicate(Tables.lineitem(spark, sfDir)
          .select(col("l_orderkey"), col("l_partkey")), k) { (li, r) =>
        li.select((col("l_orderkey") + lit(r * Shift)).as("ok"),
          col("l_partkey").as("pk"))
      }

    /** Deterministic synthetic graph with k× the vertices: two pseudo
      * random out-edges per vertex — the CC/PageRank instrument
      * (their cost is vertices + edges × rounds, not text). */
    def graphAt(k: Int): (DataFrame, DataFrame) = {
      val n = 20000L * k
      val v = spark.range(n).select(col("id").as("doc_id"))
      val e = spark.range(n).select(col("id").as("doc_a"),
          pmod(col("id") * 1103515245L + 12345L, lit(n)).as("doc_b"))
        .unionByName(spark.range(n).select(col("id").as("doc_a"),
          pmod(col("id") * 69069L + 7L, lit(n)).as("doc_b")))
      (v, e)
    }

    val families: Seq[(String, Int => DataFrame)] = Seq(
      "lsh_neardup" -> { k =>
        graft.llm.MinHashLSH.nearDupPairs(docsAt(k), "doc_id", "text",
          shingleN = 3, numHashes = 8, rowsPerBand = 1,
          minJaccardFp = 300000L, maxBucketSize = 64)
      },
      "ivf_graph_ann" -> { k =>
        val e = embAt(k)
        graft.llm.IvfIndex.knnGraphWithCodebook(e,
          graft.llm.IvfIndex.fitFixedPoint(e, 16, 3), 4, 64, nAssign = 2)
      },
      "connected_components" -> { k =>
        val (v, e) = graphAt(k)
        graft.llm.Dedup.connectedComponents(v, e)
      },
      "cc_delta" -> { k =>
        val (v, e) = graphAt(k)
        val n = 20000L * k
        val isOld = (c: org.apache.spark.sql.Column) => pmod(c, lit(10L)) =!= 0L
        val existing = graft.llm.Dedup.connectedComponents(
          v.filter(isOld(col("doc_id"))),
          e.filter(isOld(col("doc_a")) && isOld(col("doc_b"))))
          .localCheckpoint() // price the FOLD, not the base clustering
        graft.llm.Dedup.ccDelta(existing,
          v.filter(!isOld(col("doc_id"))),
          e.filter(!isOld(col("doc_a")) || !isOld(col("doc_b"))))
      },
      "bm25_topk" -> { k =>
        // one query per replica, in that replica's renamed vocabulary:
        // the query workload scales WITH the corpus
        val queries = (0 until k).map { r =>
          val sfx = if (r == 0) "" else s"z$r"
          s"q$r" -> Seq(s"the$sfx", s"data$sfx", s"spark$sfx")
        }
        graft.llm.Bm25.scoreTopK(docsAt(k), "doc_id", "text", queries, 10)
      },
      "pagerank" -> { k =>
        val (_, e) = graphAt(k)
        graft.llm.LinkRank.pageRankFp(
          e.select(col("doc_a").as("src"), col("doc_b").as("dst")), 5)
      },
      "assoc_rules" -> { k =>
        // q134's shape over replicated baskets (per-order pair
        // expansion + support filter + broadcast count joins)
        val items = graft.llm.Caches.persistTracked(itemsAt(k).distinct())
        val cnt = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
        val pairs = items.select(col("ok"), col("pk").as("a"))
          .join(items.select(col("ok"), col("pk").as("b")), "ok")
          .filter(col("a") < col("b"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("support"))
          .filter(col("support") >= 2L)
        pairs.join(broadcast(cnt.select(col("pk").as("a"), col("c").as("ca"))), "a")
          .select(col("a"), col("b"), col("support"),
            expr("cast((cast(support as decimal(38,0)) * 1000000L) div ca as bigint)")
              .as("conf_ppm"))
      },
      "containment_join" -> { k =>
        graft.llm.SparseSim.containmentPairs(docsAt(k), "doc_id", "text",
          50L, 800000L)
      },
      "cdc_chunking" -> { k =>
        graft.llm.Fingerprint.register(spark)
        graft.llm.Fingerprint.chunkCountIndex(docsAt(k), "doc_id", "text")
      },
      "nb_train" -> { k =>
        graft.llm.NbClassifier.train(docsAt(k), "text", "lang")
      },
      "funnel" -> { k =>
        graft.temporal.Funnel.reach(eventsAt(k), "user_id", "event_type",
          "us", Seq("view" -> "view", "click" -> "click",
            "purchase" -> "purchase"))
      },
      "span_removal" -> { k =>
        graft.llm.Dedup.removeDupSpans(docsAt(k), "doc_id", "text", 8, 2L)
      })

    // warmup (session/codegen startup)
    families.head._2(1).queryExecution.toRdd.count(): Unit
    graft.llm.Caches.unpersistAll(blocking = true)

    val scales = Seq(1, 10)
    val iters = sys.env.getOrElse("SPARK_GRAFT_SCALING_ITERS", "2").toInt
    val results = families.map { case (name, mk) =>
      val times = scales.map { k =>
        val t = (1 to iters).map { _ =>
          graft.llm.Caches.unpersistAll(blocking = true)
          val t0 = System.nanoTime()
          mk(k).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
        println(s"SCALING $name x$k: $t s")
        k -> t
      }.toMap
      val exp = math.log(times(10) / times(1)) / math.log(10.0)
      (name, times(1), times(10), exp)
    }
    val body = results.map { case (n, t1, t10, e) =>
      f"""  "$n": {"t1_sec": $t1%.3f, "t10_sec": $t10%.3f, "exponent": $e%.3f}"""
    }.mkString(",\n")
    val json =
      s"""{
         |"sf_base": "$sfDir",
         |"scales": [1, 10],
         |"method": "min of $iters runs, caches dropped per run, toRdd.count; replicas vocab-renamed/rotated so global duplication does not masquerade as operator cost; scheduler floor at 1x biases exponents LOW — alarm bar is exponent > 1.5",
         |"families": {
         |$body
         |}
         |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(json)
    spark.stop()
  }
}
