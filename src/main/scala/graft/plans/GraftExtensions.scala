package graft.plans

import org.apache.spark.sql.SparkSessionExtensions

import graft.expressions.{BloomBuildAgg, BloomMightContain, CosineSim, DotProduct, HitCount, LshBucket, Md5PrefixLongs, MinhashSketch, NgramHashes, RollingHash, SeededMinhash, ShingleMd5Longs, Simhash16, TopKByScore}

/** Engine extension hook, wired through `spark.sql.extensions`
  * (GraftSession sets it): the supported injection point for custom
  * Catalyst surface — native expressions today; optimizer rules /
  * strategies would register here too. Keeping registration in the
  * session factory means every entry point (Verify, Bench, apps, tests)
  * sees the same SQL surface without per-caller setup. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(RollingHash.descriptor)
    ext.injectFunction(TopKByScore.descriptor)
    ext.injectFunction(NgramHashes.descriptor)
    ext.injectFunction(MinhashSketch.descriptor)
    ext.injectFunction(DotProduct.descriptor)
    ext.injectFunction(CosineSim.descriptor)
    ext.injectFunction(LshBucket.descriptor)
    ext.injectFunction(Md5PrefixLongs.descriptor)
    ext.injectFunction(Simhash16.descriptor)
    ext.injectFunction(SeededMinhash.descriptor)
    ext.injectFunction(HitCount.descriptor)
    ext.injectFunction(ShingleMd5Longs.descriptor)
    ext.injectFunction(BloomMightContain.descriptor)
    ext.injectFunction(BloomBuildAgg.descriptor)
  }
}
