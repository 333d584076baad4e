package graft.pbp

import org.apache.spark.sql.Dataset

/** Possession sessionization — the reference's per-game state machine
  * (/root/reference/scripts/build_pbp_plays_enriched.py:106-276)
  * re-expressed as `groupByKey(gameId).flatMapGroups` (SURVEY §2.5 W6:
  * NOT plain window functions — the and-1 lookahead and pending-offense
  * hand-off need procedural state).
  *
  * Scale design: one shuffle on gameId; each game's plays (≤ a few
  * hundred rows) sort and scan in memory inside the group. At 100 TB the
  * operator parallelizes across games — state never crosses a game
  * boundary, exactly like the reference's per-game loop, minus its
  * single-process limit.
  *
  * Semantics replicated bit-for-bit (SURVEY §7.4 hard-part 1):
  *  - sort key (period asc, secondsRemaining desc, id asc), null
  *    seconds sorting last within the period (reference: None -> -1);
  *  - and-1 detection: a made/missed FGA followed (before the next
  *    action play) by a foul at the SAME clock, then the expected FT
  *    count (1 made / 2 missed / 3 missed-three) — the FGA stops ending
  *    the possession, the last FT (if made) does;
  *  - FT plays end a possession only as made last-FT;
  *  - def-rebound hands the NEXT possession to the rebounding team
  *    (pending offense), otherwise it flips to the opponent;
  *  - period change force-ends the previous play's possession and
  *    resets state;
  *  - first-possession FT special case (possession 0 + FT = action);
  *  - garbage time: period >= 2 and (margin >= 20 & <= 10min) or
  *    (margin >= 15 & <= 5min).
  */
object PossessionEngine {

  final case class Play(
      id: Long,
      gameId: Long,
      teamId: Option[Long],
      opponentId: Option[Long],
      period: Option[Int],
      secondsRemaining: Option[Long],
      playType: Option[String],
      playText: Option[String],
      scoringPlay: Boolean,
      shootingPlay: Option[Boolean],
      scoreValue: Option[Double],
      homeScore: Option[Long],
      awayScore: Option[Long],
      isHomeTeam: Option[Boolean])

  final case class EnrichedPlay(
      id: Long,
      gameId: Long,
      teamId: Option[Long],
      opponentId: Option[Long],
      period: Option[Int],
      secondsRemaining: Option[Long],
      playType: Option[String],
      scoringPlay: Boolean,
      scoreValue: Option[Double],
      homeScore: Option[Long],
      awayScore: Option[Long],
      isHomeTeam: Option[Boolean],
      possession_id: Long,
      offense_team_id: Option[Long],
      defense_team_id: Option[Long],
      possession_end: Boolean,
      garbage_time: Boolean)

  def enrich(plays: Dataset[Play],
      classifier: PlayClassifier = new PlayClassifier()): Dataset[EnrichedPlay] = {
    val spark = plays.sparkSession
    import spark.implicits._
    plays.groupByKey(_.gameId).flatMapGroups { (_, it) =>
      enrichGame(it.toSeq, classifier).iterator
    }
  }

  /** Pure per-game enrichment (unit-testable without Spark). */
  def enrichGame(playsIn: Seq[Play], classifier: PlayClassifier): Seq[EnrichedPlay] = {
    val plays = playsIn.sortBy(p =>
      (p.period.getOrElse(0), -p.secondsRemaining.getOrElse(-1L), p.id))
    val n = plays.size
    val flags = plays.map(p => classifier.classify(p.playType, p.playText,
      p.scoringPlay, p.shootingPlay, p.scoreValue)).toArray
    val isFtPlay = plays.map { p =>
      p.scoreValue.contains(1.0) ||
        (!p.scoreValue.contains(1.0) &&
          p.playType.exists(_.toLowerCase.contains("freethrow")))
    }.toArray
    val isFoulPlay = plays.map(_.playType.exists(_.toLowerCase.contains("foul"))).toArray

    def isActionStart(i: Int): Boolean = {
      val f = flags(i)
      f.isFga || f.isTurnover || f.isDefRebound || f.isOffRebound || f.isPeriodEnd
    }

    // and-1 / FT-sequence detection with bounded lookahead
    val shotWithAnd1 = scala.collection.mutable.Set[Int]()
    val lastFtIndices = scala.collection.mutable.Set[Int]()
    for (i <- 0 until n if flags(i).isFga) {
      var foulIdx = -1
      var j = i + 1
      var stop = false
      while (j < n && !stop && foulIdx < 0) {
        if (isActionStart(j)) stop = true
        else if (isFoulPlay(j) &&
          plays(j).secondsRemaining == plays(i).secondsRemaining) foulIdx = j
        j += 1
      }
      if (foulIdx >= 0) {
        val expected =
          if (plays(i).scoringPlay) 1
          else if (plays(i).scoreValue.contains(3.0)) 3
          else 2
        val ftIdx = scala.collection.mutable.ArrayBuffer[Int]()
        var k = foulIdx + 1
        var stop2 = false
        while (k < n && !stop2 && ftIdx.size < expected) {
          if (isActionStart(k)) stop2 = true
          else if (isFtPlay(k)) ftIdx += k
          k += 1
        }
        if (ftIdx.nonEmpty) {
          shotWithAnd1 += i
          lastFtIndices += ftIdx.last
        }
      }
    }

    val out = scala.collection.mutable.ArrayBuffer[EnrichedPlay]()
    var possessionId = 0L
    var currentOffense: Option[Long] = None
    var pendingOffense: Option[Long] = None
    var nextNewPossession = true
    var lastPeriod: Option[Int] = None

    plays.zipWithIndex.foreach { case (row, idx) =>
      if (lastPeriod.isDefined && row.period.isDefined && row.period != lastPeriod) {
        if (out.nonEmpty) {
          val li = out.size - 1
          out(li) = out(li).copy(possession_end = true)
        }
        nextNewPossession = true
        currentOffense = None
        pendingOffense = None
      }

      val f = flags(idx)
      var isActionPlay = f.isFga || f.isTurnover || f.isDefRebound || f.isOffRebound
      if (possessionId == 0 && isFtPlay(idx)) isActionPlay = true

      if (nextNewPossession && isActionPlay) {
        possessionId += 1
        currentOffense =
          if (pendingOffense.isDefined) pendingOffense
          else if (row.teamId.isDefined) row.teamId
          else currentOffense
        pendingOffense = None
        nextNewPossession = false
      }

      val offense = currentOffense.orElse(row.teamId)
      var possessionEnd = f.endsPossession
      if (f.isFga && shotWithAnd1.contains(idx)) possessionEnd = false
      if (isFtPlay(idx))
        possessionEnd = lastFtIndices.contains(idx) && row.scoringPlay

      val garbage = (for {
        p <- row.period if p >= 2
        sec <- row.secondsRemaining
        hs <- row.homeScore
        as <- row.awayScore
      } yield {
        val margin = math.abs(hs - as)
        (margin >= 20 && sec <= 600) || (margin >= 15 && sec <= 300)
      }).getOrElse(false)

      out += EnrichedPlay(row.id, row.gameId, row.teamId, row.opponentId,
        row.period, row.secondsRemaining, row.playType, row.scoringPlay,
        row.scoreValue, row.homeScore, row.awayScore, row.isHomeTeam,
        possessionId, offense, row.opponentId, possessionEnd, garbage)

      if (possessionEnd) {
        pendingOffense =
          if (f.isDefRebound && row.teamId.isDefined) row.teamId
          else row.opponentId
        nextNewPossession = true
      }
      lastPeriod = row.period
    }
    out.toSeq
  }
}
