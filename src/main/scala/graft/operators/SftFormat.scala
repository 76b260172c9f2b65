package graft.operators

/** SFT CHAT-TEMPLATE RENDERING — the step that turns conversation
  * turns into one training string per example: a ChatML-style
  * template (`<|im_start|>role\ncontent<|im_end|>\n`, the public
  * OpenAI/HF convention), a TOKEN-BUDGET truncation that drops whole
  * turns from the FRONT while always keeping the system turn and the
  * most recent context (the standard context-window packing rule),
  * and the LOSS-MASK accounting — which character spans of the
  * rendered string are assistant content (the only tokens SFT trains
  * on; everything else is masked).
  *
  * Pure per-conversation functions (one row in, one row out — the
  * 100 TB shape is a map over the conversations table, no shuffle);
  * the q264 oracle rebuilds the greedy suffix selection, the rendered
  * length arithmetic, and the mask totals in closed form.
  */
object SftFormat {

  final case class Turn(role: String, content: String) {
    /** Whitespace token count — the budget currency. */
    def tokens: Int = if (content.isEmpty) 0 else content.split(" ").length
  }

  final case class Rendered(text: String, keptTurns: Int, keptTokens: Int,
      assistantChars: Long, assistantTurns: Int, firstKeptRole: String)

  /** Render one turn in the ChatML-style template. */
  def renderTurn(t: Turn): String =
    s"<|im_start|>${t.role}\n${t.content}<|im_end|>\n"

  /** One DPO/RLHF preference pair: the same prompt rendered with each
    * completion as the assistant turn, ordered so `chosen` carries the
    * HIGHER score (ties keep A — deterministic). `commonPrefix` is the
    * shared character prefix of the two rendered strings — the span a
    * trainer's KV cache can reuse across the pair, the packing
    * statistic DPO batching optimizes for.
    */
  final case class PreferencePair(chosen: String, rejected: String,
      swapped: Boolean, margin: Long, commonPrefix: Int)

  def preferencePair(prompt: Seq[Turn], respA: String, scoreA: Long,
      respB: String, scoreB: Long): PreferencePair = {
    val swapped = scoreB > scoreA
    val (cTxt, rTxt) = if (swapped) (respB, respA) else (respA, respB)
    val chosen = (prompt :+ Turn("assistant", cTxt)).map(renderTurn).mkString
    val rejected = (prompt :+ Turn("assistant", rTxt)).map(renderTurn).mkString
    var i = 0
    val lim = math.min(chosen.length, rejected.length)
    while (i < lim && chosen.charAt(i) == rejected.charAt(i)) i += 1
    PreferencePair(chosen, rejected, swapped,
      math.abs(scoreA - scoreB), i)
  }

  /** Greedy-from-the-end truncation: the system turn (position 0 when
    * its role is "system") always survives; of the remaining turns the
    * LARGEST SUFFIX whose token total (plus the system's) fits
    * `budget` is kept — whole turns only, newest context wins. Then
    * render and account the assistant-content loss mask.
    */
  def render(turns: Seq[Turn], budget: Int): Rendered = {
    val (sys, rest) = turns match {
      case head +: tail if head.role == "system" => (Some(head), tail)
      case _ => (None, turns)
    }
    val sysTokens = sys.map(_.tokens).getOrElse(0)
    val avail = budget - sysTokens
    // the largest fitting suffix: walk from the end accumulating
    var from = rest.length
    var acc = 0
    var stop = false
    while (!stop && from > 0) {
      val t = rest(from - 1).tokens
      if (acc + t <= avail) { acc += t; from -= 1 } else stop = true
    }
    val kept = sys.toSeq ++ rest.drop(from)
    val text = kept.map(renderTurn).mkString
    val assistant = kept.filter(_.role == "assistant")
    Rendered(text, kept.length, sysTokens + acc,
      assistant.map(_.content.length.toLong).sum, assistant.length,
      kept.headOption.map(_.role).getOrElse(""))
  }
}
