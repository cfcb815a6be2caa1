package graft.sources.excel

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the streaming offset compaction algebra
  * ([[ExcelStreamOffset.advance]]) — the one stream surface that had no
  * adversarial generator (VERDICT r19 #8). Random (file, mtime) histories
  * (arrivals, deletions, in-place overwrites) are replayed through the
  * `maxFileAgeMs` compaction step and through an uncompacted replay of
  * the same listings; per-step admissions are diffed exactly the way
  * `planInputPartitions` diffs offsets (`end.names − start.names`).
  *
  * Pinned invariants:
  *  - no re-admission, ever, while file mtimes are fixed (arrive/delete
  *    churn) — the class contract's regime;
  *  - with in-place overwrites, a name re-admits ONLY when it was
  *    overwritten after aging out of the offset: one re-read of genuinely
  *    new content, the same trade FileStreamSource's maxFileAge makes
  *    (this prop FOUND that the original scaladoc overclaimed "never");
  *  - no loss vs the uncompacted replay when arrivals land inside the
  *    retention window (the documented trade drops ONLY too-old
  *    arrivals);
  *  - the offset stays bounded: every retained entry sits inside the
  *    retention window of the (monotone) watermark;
  *  - a legacy name-only checkpoint parsed with retention later enabled
  *    never expires its entries (mtime=MaxValue) and never re-reads them.
  */
object OffsetCompactionProps extends Properties("excel.offset.compaction") {

  private val Ret = 3000L // retention window under test
  private val StepMs = 1000L // logical clock advance per micro-batch

  /** One step of filesystem churn: how many files arrive, which existing
    * files are deleted, which are overwritten in place. Arrival mtimes
    * lag the clock by < Ret so every arrival is fresh (the no-loss
    * regime); the stale-arrival trade is tested separately. */
  private case class Churn(arrivals: Int, jitters: List[Long],
    delete: List[Int], overwrite: List[Int])

  private val genChurn: Gen[Churn] = for {
    arrivals <- Gen.chooseNum(0, 4)
    jitters <- Gen.listOfN(arrivals, Gen.chooseNum(0L, Ret - StepMs))
    delete <- Gen.listOfN(2, Gen.chooseNum(0, 99))
    overwrite <- Gen.listOfN(2, Gen.chooseNum(0, 99))
  } yield Churn(arrivals, jitters, delete, overwrite)

  private val genHistory: Gen[List[Churn]] =
    Gen.chooseNum(1, 12).flatMap(Gen.listOfN(_, genChurn))

  /** Replays churn into per-step (listing, names-overwritten-this-step).
    * Names are never reused after deletion (a reused name is semantically
    * a NEW file and would be legitimately re-read — same rule as Spark's
    * FileStreamSource). */
  private def listings(history: List[Churn])
      : List[(List[(String, Long)], Set[String])] = {
    var fs = Map.empty[String, Long]
    var nextId = 0
    history.zipWithIndex.map { case (c, step) =>
      val t = (step + 1) * StepMs
      c.jitters.foreach { j =>
        fs += (f"f$nextId%03d" -> math.max(0L, t - j)); nextId += 1
      }
      val names = fs.keys.toVector.sorted
      c.delete.foreach { d =>
        if (names.nonEmpty) fs -= names(d % names.size)
      }
      val names2 = fs.keys.toVector.sorted
      val over = c.overwrite.flatMap { o =>
        if (names2.nonEmpty) {
          val n = names2(o % names2.size)
          if (fs.contains(n)) { fs += (n -> t); Some(n) } else None
        } else None
      }.toSet
      (fs.toList.sortBy(_._1), over)
    }
  }

  /** Replay a listing history from `init`, returning (final offset,
    * per-step admitted names) — admission diffed exactly like
    * `planInputPartitions`. */
  private def replay(init: ExcelStreamOffset, ls: List[List[(String, Long)]],
      retention: Option[Long])
      : (ExcelStreamOffset, List[Set[String]]) = {
    var off = init
    val admitted = ls.map { listing =>
      val next = ExcelStreamOffset.advance(off, listing, retention)
      val fresh = next.names.toSet -- off.names.toSet
      off = next
      fresh
    }
    (off, admitted)
  }

  private val empty = ExcelStreamOffset(Nil, 0L, compacted = true)

  property("no re-admission, ever, while file mtimes are fixed (the " +
    "class contract's regime: arrivals and deletions only)") =
    Prop.forAll(genHistory) { h =>
      val fixed = h.map(_.copy(overwrite = Nil))
      val (_, admitted) = replay(empty, listings(fixed).map(_._1), Some(Ret))
      val all = admitted.flatMap(_.toList)
      all.size == all.distinct.size
    }

  property("with in-place overwrites, a name re-admits ONLY if it was " +
    "overwritten since its previous admission (new content ⇒ one " +
    "re-read — FileStreamSource's maxFileAge trade, found by this prop)") =
    Prop.forAll(genHistory) { h =>
      val ls = listings(h)
      var off = empty
      var seenEver = Set.empty[String]
      var overwrittenSince = Set.empty[String] // since last admission
      ls.forall { case (listing, over) =>
        overwrittenSince ++= over
        val next = ExcelStreamOffset.advance(off, listing, Some(Ret))
        val fresh = next.names.toSet -- off.names.toSet
        val readmitted = fresh.intersect(seenEver)
        val ok = readmitted.subsetOf(overwrittenSince)
        seenEver ++= fresh
        overwrittenSince --= fresh
        off = next
        ok
      }
    }

  property("no loss vs uncompacted replay when arrivals are fresh") =
    Prop.forAll(genHistory) { h =>
      val ls = listings(h).map(_._1)
      val (_, compacted) = replay(empty, ls, Some(Ret))
      val (_, exact) = replay(ExcelStreamOffset(Nil), ls, None)
      // an overwrite-after-expiry re-read is a compacted-mode EXTRA, so
      // compare as supersets: everything the exact replay reads, the
      // compacted one reads too (no loss)
      exact.flatMap(_.toList).toSet
        .subsetOf(compacted.flatMap(_.toList).toSet)
    }

  property("offset stays bounded: every entry within the retention " +
    "window; watermark monotone") =
    Prop.forAll(genHistory) { h =>
      var off = empty
      listings(h).map(_._1).forall { listing =>
        val next = ExcelStreamOffset.advance(off, listing, Some(Ret))
        val ok = next.watermark >= off.watermark &&
          next.entries.forall(_._2 >= next.watermark - Ret)
        off = next
        ok
      }
    }

  property("a stale arrival (mtime below the cutoff) is never admitted, " +
    "at landing or later") =
    Prop.forAll(genHistory, Gen.chooseNum(1L, 5L)) { (h, staleBy) =>
      val ls = listings(h).map(_._1)
      // plant one file whose mtime is below the cutoff at landing time
      // (needs an established watermark, so plant into the LAST listing)
      val wmSoFar = ls.flatten.map(_._2).maxOption.getOrElse(0L)
      val stale = "stale_file" -> (wmSoFar - Ret - staleBy)
      val planted = ls.dropRight(1) ++ ls.lastOption.map(_ :+ stale).toList
      val (_, admitted) = replay(empty, planted, Some(Ret))
      // one extra advance on an unchanged listing: still not admitted
      val (off, _) = replay(empty, planted, Some(Ret))
      val again = ExcelStreamOffset.advance(off, planted.lastOption
        .getOrElse(Nil), Some(Ret))
      !admitted.exists(_.contains("stale_file")) &&
        !(again.names.toSet -- off.names.toSet).contains("stale_file")
    }

  property("legacy name-only checkpoint + retention enabled later: " +
    "nothing expires, nothing re-reads") =
    Prop.forAll(genHistory) { h =>
      val ls = listings(h).map(_._1)
      // phase 1: run WITHOUT retention, checkpoint as name-only JSON
      val (off1, admitted1) = replay(ExcelStreamOffset(Nil), ls, None)
      val restored = ExcelStreamOffset.fromJson(off1.json())
      // phase 2: continue WITH retention from the legacy checkpoint over
      // fresh follow-on listings
      val t0 = ls.flatten.map(_._2).maxOption.getOrElse(0L)
      val followOn = (1 to 3).toList.map { s =>
        val t = t0 + s * StepMs
        (ls.lastOption.getOrElse(Nil) :+ (s"new_$s" -> t))
          .sortBy(_._1)
      }
      val (_, admitted2) = replay(restored, followOn, Some(Ret))
      val phase1Names = admitted1.flatMap(_.toList).toSet
      val phase2Names = admitted2.flatMap(_.toList).toSet
      // legacy entries (mtime=MaxValue) never re-read...
      phase2Names.intersect(phase1Names).isEmpty &&
        // ...and the fresh follow-on files all get read
        (1 to 3).forall(s => phase2Names.contains(s"new_$s"))
    }

  private val genNastyName: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('"', '\\', '/', ' ', ',', '[', ']')))
    .map(cs => "f_" + cs.mkString)

  property("offset JSON round-trips through fromJson in both wire " +
    "formats, names with quotes/backslashes included") =
    Prop.forAll(Gen.listOf(Gen.zip(genNastyName, Gen.chooseNum(0L, 1L << 40)))) {
      pairs =>
        val entries = pairs.distinctBy(_._1).sortBy(_._1)
        val exact = ExcelStreamOffset(entries.map(_._1 -> Long.MaxValue))
        val compacted = ExcelStreamOffset(entries, 12345L, compacted = true)
        ExcelStreamOffset.fromJson(exact.json()) == exact &&
          ExcelStreamOffset.fromJson(compacted.json()) == compacted
    }
}
