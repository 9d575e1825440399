package graft

/** Pins the S3A object-store profile (Confs.S3aProfile, the
  * reference-manifest scan/commit tuning): every session the library
  * builds goes through GraftSession.builder, so the profile must be
  * present on the SHARED test session — both at the Spark-conf layer
  * and, for the `spark.hadoop.*` keys, in the stripped Hadoop
  * Configuration the FileSystem layer actually reads. A key typo'd or
  * dropped here would otherwise only surface as a production scan
  * regression on the real object store.
  */
class ConfsSpec extends SparkTestBase {

  test("every S3A profile conf lands in the session conf") {
    Confs.S3aProfile.foreach { case (k, v) =>
      assert(spark.conf.getOption(k) === Some(v), s"conf $k")
    }
  }

  test("spark.hadoop.* keys reach the Hadoop Configuration layer") {
    val hc = spark.sparkContext.hadoopConfiguration
    Confs.S3aProfile.foreach {
      case (k, v) if k.startsWith("spark.hadoop.") =>
        assert(hc.get(k.stripPrefix("spark.hadoop.")) === v, s"hadoop $k")
      case _ => ()
    }
  }

  test("IRSA credential provider is opt-in, NOT in the default session") {
    // Pinning WebIdentityTokenCredentialsProvider by default would
    // replace the AWS credential chain and break non-EKS deployments;
    // the library session must leave the chain alone.
    Confs.IrsaCredentials.foreach { case (k, _) =>
      assert(spark.conf.getOption(k).isEmpty, s"conf $k must be unset")
      assert(!S3aProfileKeys.contains(k), s"$k must not be in S3aProfile")
    }
  }

  private def S3aProfileKeys = Confs.S3aProfile.map(_._1).toSet
}
