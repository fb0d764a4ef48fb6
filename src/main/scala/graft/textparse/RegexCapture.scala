package graft.textparse

import graft.engine.{MetaSink, SpanSink}

/** Line-based regex capture over text documents.
  *
  * Reference behavior: tika-core `RegexCaptureParser.java` — when
  * configured it IS the text/plain parser: each line is tested against
  * every capture pattern (group 1 collected, deduplicated in
  * first-seen order, emitted as multi-valued metadata after the whole
  * document) and every match pattern (key set to "true" on any hit);
  * line content reaches the handler only when `writeContent` is on,
  * and then without line terminators (the reference emits only the
  * line's own characters).
  */
object RegexCapture {

  def extract(text: String, captures: Seq[(String, String)],
      matches: Seq[(String, String)], writeContent: Boolean,
      sink: SpanSink, meta: MetaSink): Unit = {
    val capM = captures.map { case (k, re) => (k, re.r.pattern.matcher("")) }
    val matM = matches.map { case (k, re) => (k, re.r.pattern.matcher("")) }
    val keyVals =
      scala.collection.mutable.LinkedHashMap
        .empty[String, scala.collection.mutable.LinkedHashSet[String]]
    // BufferedReader.readLine semantics: \n, \r, or \r\n all terminate
    val lines = text.split("\r\n|[\r\n]", -1)
    var i = 0
    val n =
      if (lines.nonEmpty && lines.last.isEmpty) lines.length - 1
      else lines.length
    while (i < n) {
      val line = lines(i)
      capM.foreach { case (k, m) =>
        if (m.reset(line).find() && m.groupCount() >= 1) {
          val v = m.group(1)
          if (v != null)
            keyVals.getOrElseUpdate(k,
              scala.collection.mutable.LinkedHashSet.empty[String]) += v
        }
      }
      matM.foreach { case (k, m) =>
        if (m.reset(line).find()) meta.set(k, "true")
      }
      if (writeContent) sink.chars(line)
      i += 1
    }
    keyVals.foreach { case (k, vals) => vals.foreach(v => meta.add(k, v)) }
  }
}
