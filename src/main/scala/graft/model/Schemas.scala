package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for the three sensor tables of the reference
  * (`/root/reference/app.py:39-46,64-72,92-99`) and for the driver's
  * parquet test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * The reference infers CSV schemas (`app.py:225,230,235`); we prefer
  * explicit schemas for determinism and so the vectorized CSV/parquet
  * readers can prune and push down (SURVEY.md §1.3-1.4).
  */
object Schemas {

  /** camera_data — `app.py:39-46`. 30 Hz object-tracking detections. */
  val camera: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("frame_id", LongType, nullable = false),
    StructField("object_x", DoubleType, nullable = true), // 5% NaN injected (app.py:49)
    StructField("object_y", DoubleType, nullable = true), // -999 sentinel (app.py:50)
    StructField("object_size", DoubleType, nullable = true),
    StructField("confidence", DoubleType, nullable = true)
  ))

  /** motion_data — `app.py:64-72`. 50 Hz IMU channels. */
  val motion: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("accel_x", DoubleType, nullable = true),
    StructField("accel_y", DoubleType, nullable = true),
    StructField("accel_z", DoubleType, nullable = true),
    StructField("gyro_x", DoubleType, nullable = true),
    StructField("gyro_y", DoubleType, nullable = true),
    StructField("gyro_z", DoubleType, nullable = true)
  ))

  /** log_data — `app.py:92-99`. Irregular robot event log. */
  val log: StructType = StructType(Seq(
    StructField("timestamp", TimestampType, nullable = false),
    StructField("event_type", StringType, nullable = true),
    StructField("joint_1", DoubleType, nullable = true),
    StructField("joint_2", DoubleType, nullable = true),
    StructField("joint_3", DoubleType, nullable = true),
    StructField("gripper_force", DoubleType, nullable = true)
  ))

  /** The reference's 7 event types in generator order (`app.py:89`). */
  val logEventTypes: Seq[String] = Seq(
    "GRIPPER_OPEN", "GRIPPER_CLOSE", "ARM_MOVE", "SENSOR_READ",
    "CALIBRATION", "ERROR", "WARNING")

  /** Weights of the 7 event types (`app.py:90`). */
  val logEventWeights: Seq[Double] = Seq(0.15, 0.15, 0.3, 0.2, 0.1, 0.05, 0.05)

  /** Numeric columns of a schema — mirrors the reference's dynamic
    * `select_dtypes(include=[np.number])` discovery (`app.py:114`). */
  def numericCols(schema: StructType): Seq[String] =
    schema.fields.collect { case f if f.dataType.isInstanceOf[NumericType] => f.name }.toSeq
}
