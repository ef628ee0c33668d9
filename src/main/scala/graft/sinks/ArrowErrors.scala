package graft.sinks

/** Error taxonomy for the bulk-import service, matching the reference's
  * interpretation rules (neo4j_arrow_error.py:12-95): classify a raw
  * transport exception by substrings of its message.
  */
object ArrowErrors {

  sealed abstract class ArrowException(val message: String)
    extends RuntimeException(message)

  /** Graph/database already exists or an import with the name is running. */
  final class AlreadyExists(m: String) extends ArrowException(m)
  /** Invalid entity or invalid action requested. */
  final class InvalidArgument(m: String) extends ArrowException(m)
  /** The requested import process could not be found. */
  final class NotFound(m: String) extends ArrowException(m)
  /** Something bad happened on the server side. */
  final class InternalError(m: String) extends ArrowException(m)
  /** No idea what is wrong — message beautified to its last line, with
    * escaped newlines/quotes unescaped (neo4j_arrow_error.py:44-56).
    */
  final class UnknownError(raw: String) extends ArrowException({
    try raw.replace("\\n", "\n").replace("\\'", "'").linesIterator.toSeq.last
    catch { case _: Throwable => raw }
  })

  /** Classify `e` by its message; returns `e` unchanged when no rule
    * matches (neo4j_arrow_error.py:12-40).
    */
  def interpret(e: Throwable): Throwable = {
    val message = Option(e.getMessage).getOrElse("")
    val upper = message.toUpperCase
    val lower = message.toLowerCase
    if (upper.contains("ALREADY_EXISTS")) new AlreadyExists(message)
    else if (upper.contains("INVALID_ARGUMENT")) new InvalidArgument(message)
    else if (upper.contains("NOT_FOUND") ||
      (lower.contains("not found") && lower.contains("arrow process")))
      new NotFound(message)
    else if (upper.contains("INTERNAL")) new InternalError(message)
    else if (upper.contains("UNKNOWN")) new UnknownError(message)
    else e
  }
}
