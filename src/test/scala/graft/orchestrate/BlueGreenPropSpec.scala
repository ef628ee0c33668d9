package graft.orchestrate

import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants over the blue/green planners — 200 generated
  * catalog states per property (fixed seed, reproducible). These are the
  * safety properties a deployment relies on: an aliased database is never
  * dropped, the newest `keep` deployments always survive, and the plans
  * replay cleanly through the SystemCatalog semantics.
  */
class BlueGreenPropSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)

  private def randomState(): (Seq[String], Map[String, String]) = {
    val customers = (1 to (1 + rnd.nextInt(4))).map(i => s"cust$i")
    val dbs = customers.flatMap { c =>
      (0 until rnd.nextInt(6)).map(_ => BlueGreen.dbName(c, rnd.nextInt(1000).toLong))
    }.distinct
    val aliases = customers.flatMap { c =>
      val targets = dbs.filter(_.startsWith(c + "-"))
      if (targets.isEmpty || rnd.nextBoolean()) None
      else Some(c -> targets(rnd.nextInt(targets.length)))
    }.toMap
    (dbs, aliases)
  }

  test("cleanupPlan never drops an aliased db and always keeps the newest k") {
    (1 to 200).foreach { _ =>
      val (dbs, aliases) = randomState()
      val keep = 1 + rnd.nextInt(3)
      dbs.flatMap(BlueGreen.parseDb).map(_._1).distinct.foreach { c =>
        val drops = BlueGreen.cleanupPlan(c, dbs, aliases, keep)
          .map(_.stripPrefix("DROP DATABASE `").stripSuffix("` IF EXISTS"))
        assert(drops.forall(d => !aliases.values.exists(_ == d)),
          s"aliased db dropped: $drops vs $aliases")
        val newest = dbs.flatMap(BlueGreen.parseDb).filter(_._1 == c)
          .sortBy(-_._2).take(keep).map { case (cc, ts) => BlueGreen.dbName(cc, ts) }
        assert(newest.forall(n => !drops.contains(n)),
          s"newest-$keep victim: $newest vs $drops")
      }
    }
  }

  test("setAliasPlan replays cleanly through SystemCatalog from any state") {
    (1 to 200).foreach { _ =>
      val (dbs, aliases) = randomState()
      val cat = new SystemCatalog
      dbs.foreach(cat.createDatabase)
      aliases.foreach { case (a, t) =>
        cat.execute(s"CREATE ALIAS $a FOR DATABASE `$t`")
      }
      val customer = s"cust${1 + rnd.nextInt(4)}"
      val target = BlueGreen.dbName(customer, 5000L)
      cat.createDatabase(target)
      BlueGreen.setAliasPlan(cat.showAliases, customer, target).foreach(cat.execute)
      assert(cat.showAliases(customer) == target)
    }
  }

  test("teardownPlan leaves no alias pointing at a dropped customer db") {
    (1 to 200).foreach { _ =>
      val (dbs, aliases) = randomState()
      val customers = dbs.flatMap(BlueGreen.parseDb).map(_._1).distinct
      val victims = customers.filter(_ => rnd.nextBoolean())
      val cat = new SystemCatalog
      dbs.foreach(cat.createDatabase)
      aliases.foreach { case (a, t) => cat.execute(s"CREATE ALIAS $a FOR DATABASE `$t`") }
      BlueGreen.teardownPlan(victims, dbs, aliases).foreach(cat.execute)
      victims.foreach { v =>
        assert(!cat.showDatabases.exists(_.startsWith(v + "-")),
          s"$v databases survive teardown")
        assert(!cat.showAliases.values.exists(t =>
          BlueGreen.parseDb(t).exists(p => victims.contains(p._1))),
          "alias dangles at a torn-down customer db")
      }
    }
  }

  test("parseDb inverts dbName for any customer id and timestamp") {
    (1 to 200).foreach { _ =>
      val c = (1 to (1 + rnd.nextInt(3)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar.toString * (1 + rnd.nextInt(4)))
        .mkString("-") // customer ids may themselves contain dashes
      val ts = rnd.nextLong().abs % 10_000_000_000L
      assert(BlueGreen.parseDb(BlueGreen.dbName(c, ts)).contains((c, ts)))
    }
  }
}
