package graft.ops

import graft.SparkSpec

class ScratchBpeTiming extends SparkSpec {
  test("time bpe training loop") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[scratch] $name%-20s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    t("warm")(TextOps.bpeMerges(docs, rounds = 2).collect())
    t("rounds=4")(TextOps.bpeMerges(docs, rounds = 4).collect())
    t("rounds=32")(TextOps.bpeMerges(docs, rounds = 32).collect())
    t("fertility32")(TextOps.bpeFertility(docs, rounds = 32).collect())
  }
}
