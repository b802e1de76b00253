package graft.sources

/** R28: the workflow-config `version:` scan and reference-panel path
  * derivation (`LASERInputValidator.java:41-64`,
  * `TRACEInputValidator.java:38-62`).
  *
  * Reference semantics, reproduced exactly:
  *   - only lines whose UNtrimmed text starts with `version:` are
  *     considered (a leading space defeats the match);
  *   - the trimmed line is split on EVERY `:`; only an exactly-2-part
  *     split sets the version (so `version:1:0` is skipped — but an
  *     earlier match survives);
  *   - the LAST matching line wins (the reference loop keeps overwriting);
  *   - `None` if nothing matched (the reference errors out,
  *     `LASERInputValidator.java:59-62`).
  */
object WorkflowConfig {

  def parseVersion(lines: IterableOnce[String]): Option[String] = {
    var v: Option[String] = None
    lines.iterator.foreach { line =>
      if (line.startsWith("version:")) {
        val kv = line.trim.split(":")
        if (kv.length == 2) v = Some(kv(1).trim)
      }
    }
    v
  }

  def parseVersionFile(path: String): Option[String] = {
    val src = scala.io.Source.fromFile(path)
    try parseVersion(src.getLines()) finally src.close()
  }

  /** `<tempDir>/../../../apps/<app>@<v>/<v>/references` — the exact
    * relative hop the reference takes (`LASERInputValidator.java:64` with
    * `app = "laser"`, `TRACEInputValidator.java:62` with `app = "trace"`),
    * through Hadoop `Path` so normalization matches byte-for-byte. */
  def referencesDir(tempDir: String, app: String, version: String): String =
    new org.apache.hadoop.fs.Path(tempDir,
      s"../../../apps/$app@$version/$version/references/").toString

  /** Panel site file under the references dir
    * (`referencesSiteSuffix = ".site.gz"`, `LASERInputValidator.java:19`;
    * assembled at `:113`). */
  def panelSitePath(referencesDir: String, reference: String): String =
    s"$referencesDir/$reference.site.gz"
}
