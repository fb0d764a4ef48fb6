package graft.xmlx

import org.xml.sax.helpers.DefaultHandler

/** Namespace-aware XXE-safe SAX parsing (thread-local parser reuse).
  * The engine's main SAX path (`DocxExtractor.saxParse`) is prefix-based
  * for speed; formats whose semantics hang on namespace URIs (XFA,
  * WordML/SpreadsheetML 2003) parse through this one.
  */
object NsSax {

  private val threadParser = new ThreadLocal[javax.xml.parsers.SAXParser] {
    override def initialValue(): javax.xml.parsers.SAXParser = {
      val f = javax.xml.parsers.SAXParserFactory.newInstance()
      f.setNamespaceAware(true)
      f.setValidating(false)
      try {
        f.setFeature("http://xml.org/sax/features/external-general-entities", false)
        f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
        f.setFeature("http://apache.org/xml/features/nonvalidating/load-external-dtd", false)
      } catch { case _: Exception => () }
      try f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
      catch { case _: Exception => () }
      f.newSAXParser()
    }
  }

  /** Parse; SAXException propagates (callers decide the failure mode),
    * but engine control-flow throwables tunnel through like saxParse.
    */
  def parse(bytes: Array[Byte], handler: DefaultHandler): Unit = {
    val p = threadParser.get()
    p.reset()
    try p.parse(new java.io.ByteArrayInputStream(bytes), handler)
    catch {
      case e: org.xml.sax.SAXException =>
        e.getCause match {
          case w: graft.engine.WriteLimitReached => throw w
          case z: graft.engine.ZipBombDetected => throw z
          case t: graft.engine.DocTimeout => throw t
          case _ => throw e
        }
    }
  }
}
