package graft.queries

/** Single source of truth for every implemented query/operator. */
object Registry {
  val all: Seq[Q] =
    Core.all ++ IngestQ.all ++ Text.all ++ Dedup.all ++ Sim.all ++ Olap.all ++
      Curation.all ++ Geo.all ++ Evals.all ++
      graft.sources.IngestJob.all ++ graft.sources.JdbcRemote.all ++
      graft.streaming.EventStream.all ++ graft.streaming.SnapshotStream.all ++
      graft.multimodal.MediaDecoder.all ++ graft.operators.Skew.all ++
      graft.operators.Bitmap.all ++
      graft.operators.AsOf.all ++ graft.operators.Kmeans.all ++
      graft.operators.FrequentItems.all ++ graft.operators.ResultCache.all

  require(
    all.map(_.name).distinct.size == all.size,
    s"duplicate query names in registry: ${all.map(_.name)}")
}
