package graft.operators

/** Committed canonical output fingerprints ([[Golden.fingerprint]]:
  * row count + decimal sum of per-row xxhash64) for the rows-only
  * queries, per testdata dir. Regenerate any entry with
  *
  * {{{ sbt "runMain graft.tools.GoldenDumpMain /root/testdata/<sf>" }}}
  *
  * after an intended output-affecting change (codec, k-means init, or a
  * driver-side testdata regeneration) — an UNINTENDED change is exactly
  * what these pin against.
  */
object GoldenSnapshots {

  val imagePhash: Map[String, (Long, String)] = Map(
    "sf0.001" -> (167L, "2265496246261080818"),
    "sf0.01" -> (167L, "2265496246261080818"),
    "sf0.1" -> (1667L, "-271228462643418963865"),
    "testdata_sf1" -> (16667L, "-1011775379149743439112"))

  val multimodalFeatures: Map[String, (Long, String)] = Map(
    "sf0.001" -> (500L, "-62679219061312553617"),
    "sf0.01" -> (500L, "-62679219061312553617"),
    "sf0.1" -> (5000L, "-223105732010355359022"),
    "testdata_sf1" -> (50000L, "-934384430905317758919"))

  val cdcDedup: Map[String, (Long, String)] = Map(
    "sf0.001" -> (5L, "11279766699794210170"),
    "sf0.01" -> (5L, "1076948753418236008"),
    "sf0.1" -> (5L, "-8247012922596709772"),
    "testdata_sf1" -> (5L, "20603684107022638283"))

  val kmeansSizes: Map[String, (Long, String)] = Map(
    "sf0.001" -> (8L, "-5366198007469340652"),
    "sf0.01" -> (8L, "-11496621668772080012"),
    "sf0.1" -> (8L, "-9545668509895777656"),
    "testdata_sf1" -> (8L, "12605754003777894778"))
}
