package graft.xmlx

import graft.engine.{WriteLimitReached, ZipBombDetected}
import org.xml.sax.helpers.DefaultHandler

/** Shared hardened namespace-aware SAX parsing for the XML-based format
  * extractors (TMX/XLIFF, DIF, FictionBook, IDML, iWork).
  *
  * `SAXParserFactory.newInstance` is a synchronized classloader service
  * scan — per-document construction serializes executor threads on one
  * lock (the same reason DocxExtractor.saxParse keeps a thread-local
  * parser; reference: tika-core parser/Parser.java thread-safety
  * contract, parser instance reuse per worker). XXE stance matches the
  * engine's XML path: DOCTYPEs tolerated, external entities/DTDs never
  * resolved.
  */
object SecureSax {

  private def makeParser(nsAware: Boolean): javax.xml.parsers.SAXParser = {
    val f = javax.xml.parsers.SAXParserFactory.newInstance()
    f.setNamespaceAware(nsAware)
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

  private val nsParser = new ThreadLocal[javax.xml.parsers.SAXParser] {
    override def initialValue(): javax.xml.parsers.SAXParser = makeParser(true)
  }
  private val plainParser = new ThreadLocal[javax.xml.parsers.SAXParser] {
    override def initialValue(): javax.xml.parsers.SAXParser = makeParser(false)
  }

  private def run(tl: ThreadLocal[javax.xml.parsers.SAXParser],
      bytes: Array[Byte], handler: DefaultHandler): Unit = {
    val p = tl.get()
    p.reset()
    try p.parse(new java.io.ByteArrayInputStream(bytes), handler)
    catch {
      case e: org.xml.sax.SAXException =>
        e.getCause match { // engine guards tunneled through SAX wrappers
          case w: WriteLimitReached => throw w
          case z: ZipBombDetected => throw z
          case t: graft.engine.DocTimeout => throw t
          case _ => throw e
        }
    }
  }

  /** Namespace-aware hardened parse (localName populated). */
  def parseNs(bytes: Array[Byte], handler: DefaultHandler): Unit =
    run(nsParser, bytes, handler)

  /** qName-driven hardened parse (namespaceAware = false). */
  def parse(bytes: Array[Byte], handler: DefaultHandler): Unit =
    run(plainParser, bytes, handler)
}
