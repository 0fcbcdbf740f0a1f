package graft

import java.nio.file.Files
import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import graft.ml.Maintenance

class MaintenanceSpec extends GraftSpec {

  test("RF agrees with the threshold rule on every record (separable data)") {
    val df = Maintenance.ml01RfScoring(spark, sfTiny).cache()
    assert(df.count() == 10000L)
    assert(df.filter(col("rf_prediction") =!= col("rule_prediction")).count() == 0)
    assert(df.filter(col("rf_prediction") =!= col("is_anomaly")).count() == 0)
    df.unpersist()
  }

  test("held-out precision/recall reproduce the reference's 1.00/1.00") {
    val (p, r) = Maintenance.evaluate(spark)
    assert(p == 1.0, s"precision $p")
    assert(r == 1.0, s"recall $r")
  }

  test("model save/load roundtrip preserves predictions (S8)") {
    val dir = Files.createTempDirectory("graft-model").toString
    val model = Maintenance.train(spark)
    model.write.overwrite().save(dir)
    val loaded = PipelineModel.load(dir)
    val a = model.transform(operators.Telemetry.twin(spark))
      .select("id", "prediction").collect().sortBy(_.getLong(0))
    val b = loaded.transform(operators.Telemetry.twin(spark))
      .select("id", "prediction").collect().sortBy(_.getLong(0))
    assert(a.sameElements(b))
  }
}
