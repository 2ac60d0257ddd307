package graft.ops

import graft.core.Pdf

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PDF extraction plumbing for the north rule's "PDF/layout parse" leg:
  * documents render to real PDF bytes on the executors ([[synthesize]] —
  * four encoding/layout variants so every parser path runs in the oracled
  * query), and [[extractText]] recovers the text in reading order with
  * [[graft.core.Pdf]]'s layout analysis. Both stages are `mapPartitions`
  * over typed Datasets — zero shuffles, the same slot a real scanned-PDF
  * corpus column would occupy.
  *
  * The end-to-end oracle is exact by construction: [[Pdf.wrap]] breaks
  * only at single spaces, so `extracted.replace('\n', ' ') == text` — the
  * Spark side runs write→parse→layout while DuckDB just reads the source
  * column. Any parser or layout defect (lost line, wrong column order,
  * kerning space missed, escape mishandled) breaks the hash.
  */
object PdfOps {
  /** One rendered document: the PDF payload plus which variant wrote it. */
  final case class PdfDoc(doc_id: Long, variant: Int, pdf: Array[Byte])

  /** Extraction result: reading-order text, lines joined with `\n`. */
  final case class PdfText(doc_id: Long, variant: Int, extracted: String)

  /** The four corpus variants:
    * 0 — literal strings, relative positioning (`Td`/`T*`/`'`);
    * 1 — FlateDecode-compressed streams with hex show strings;
    * 2 — compressed two-column layout, right column first in stream order
    *     (exercises the column-clustering reading-order recovery);
    * 3 — `TJ` arrays with kerning adjustments standing in for spaces.
    */
  def layoutFor(variant: Int): Pdf.Layout = ((variant % 4) + 4) % 4 match {
    case 0 => Pdf.Layout()
    case 1 => Pdf.Layout(compress = true, hexStrings = true)
    case 2 => Pdf.Layout(compress = true, twoColumn = true, linesPerPage = 24)
    case _ => Pdf.Layout(kernedSpaces = true)
  }

  /** Render each document's text to a complete PDF file (variant by
    * `doc_id % 4`). Map-side only; the payload column is opaque binary
    * downstream, exactly like the media corpus.
    */
  def synthesize(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): Dataset[PdfDoc] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val v = (id % 4).toInt
        PdfDoc(id, v, Pdf.write(if (text == null) "" else text, layoutFor(v)))
      })
  }

  /** Parse each payload and recover reading-order text. Map-side only;
    * malformed payloads yield best-effort text (never an exception), so
    * one bad scan cannot kill a 100 TB extraction stage.
    */
  def extractText(pdfs: Dataset[PdfDoc]): Dataset[PdfText] = {
    val s = pdfs.sparkSession
    import s.implicits._
    pdfs.mapPartitions(_.map(d => PdfText(d.doc_id, d.variant, Pdf.extractText(d.pdf))))
  }
}
