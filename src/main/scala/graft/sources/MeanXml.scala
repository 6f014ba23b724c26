package graft.sources

/** Driver-side parser for the reference's OpenCV mean-image XML
  * (R16 fidelity): `CIFAR-10_mean.xml` is an `opencv_storage` document
  * whose `<MeanImg><data>` holds 3072 whitespace-separated float
  * literals (reference file lines 6-11; parsed at ipynb:198-201 into
  * the broadcast mean). The reference artifact is DATA, not code — it
  * is read at runtime from the read-only reference checkout (or the
  * `SPARK_GRAFT_MEAN_XML` override), never copied into this repo.
  */
object MeanXml {

  val DefaultPath = "/root/reference/CIFAR-10_mean.xml"

  def path: String = sys.env.getOrElse("SPARK_GRAFT_MEAN_XML", DefaultPath)

  /** All values inside `<data>...</data>`, parsed as doubles in file
    * order. Both engines consume the SAME parsed constants (Spark as
    * literals, DuckDB via a generated VALUES table), so float-vs-double
    * literal interpretation cannot diverge. */
  def parse(p: String = path): Array[Double] = {
    val text = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)
    val data = "(?s)<data>(.*?)</data>".r.findFirstMatchIn(text)
      .getOrElse(throw new IllegalArgumentException(s"no <data> element in $p"))
      .group(1)
    data.trim.split("\\s+").map(java.lang.Double.parseDouble)
  }
}
