package graft.fmt

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full P9 filename parser vs the reference's parametrized expectations
  * (/root/reference/tests/test_s3.py:19-111): every variant — seconds+Z
  * extras, checksum suffixes, the legacy mixed-case uva shape — must
  * produce exactly the reference's (radar_code, data_type, year, month,
  * day, hour, minute, file_name) tuple, and the invalid name must fail
  * the regex gate (the engine-side ValueError analog).
  */
class OdimPathSpec extends AnyFunSuite with SparkSuite {

  // (path, expected components) straight from the reference test table
  private val expected = Seq(
    ("baltrad/hdf5/fivan/2016/10/25/fivan_vp_20161025T2100Z_0x7_147742969449.h5",
     ("fivan", "vp", "2016", "10", "25", "21", "00",
      "fivan_vp_20161025T2100Z_0x7_147742969449.h5")),
    ("baltrad/hdf5/fiuta/2021/11/14/fiuta_vp_20211114T214500Z_0xb.h5",
     ("fiuta", "vp", "2021", "11", "14", "21", "45",
      "fiuta_vp_20211114T214500Z_0xb.h5")),
    ("baltrad/hdf5/seang/2017/01/20/seang_vp_20170120T2115Z_0xf3fc7b_148494821853.h5",
     ("seang", "vp", "2017", "01", "20", "21", "15",
      "seang_vp_20170120T2115Z_0xf3fc7b_148494821853.h5")),
    ("baltrad/hdf5/searl/2016/12/31/searl_vp_20161231T2030Z_0x5_148321870475.h5",
     ("searl", "vp", "2016", "12", "31", "20", "30",
      "searl_vp_20161231T2030Z_0x5_148321870475.h5")),
    ("baltrad/hdf5/plrze/2020/10/27/plrze_vp_20201027T172000Z_0x9.h5",
     ("plrze", "vp", "2020", "10", "27", "17", "20",
      "plrze_vp_20201027T172000Z_0x9.h5")),
    ("uva/hdf5/2008/02/15/NLDBL_vp_20080215T0000_NL50_v0-3-20.h5",
     ("nldbl", "vp", "2008", "02", "15", "00", "00",
      "NLDBL_vp_20080215T0000_NL50_v0-3-20.h5")))

  test("all reference variants parse to the reference's exact components") {
    import spark.implicits._
    val df = expected.map(_._1).toDF("p")
      .select(col("p") +: OdimPath.parse(col("p")): _*)
    val got = df.collect().map(r =>
      r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3),
        r.getString(4), r.getString(5), r.getString(6), r.getString(7),
        r.getString(8)))).toMap
    expected.foreach { case (p, want) =>
      assert(got(p) == want, s"variant $p")
    }
    // derived country/radar split (s3.py:113-120)
    val nl = df.filter(col("radar_code") === "nldbl").head()
    assert(nl.getAs[String]("country") == "nl" &&
           nl.getAs[String]("radar") == "dbl")
  }

  test("invalid names fail the regex gate; valid ones pass it") {
    import spark.implicits._
    val names = (expected.map(_._1) :+ "not a valid file name").toDF("p")
    val valid = names.filter(OdimPath.isValid(col("p"))).count()
    assert(valid == expected.size)
  }
}
