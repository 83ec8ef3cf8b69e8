package graft.streaming

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Pins that every record type the stateful-streaming processors push
  * through an encoder — state-store records AND emitted rows — compiles
  * under whole-stage/Janino codegen instead of silently degrading.
  *
  * Why this spec exists: Spark's `UnsafeProjection.create` is a
  * `CodeGeneratorWithInterpretedFallback` — when Janino cannot compile the
  * generated accessors it logs one WARN and falls back to interpreter-mode
  * projection, so every functional test still passes while every state
  * row at scale pays interpreted serialization (round 9 shipped exactly
  * this: the state case classes were `private` nested in the object, whose
  * accessors compile package-private in bytecode, invisible to
  * Janino-compiled code). `GenerateUnsafeProjection.generate` is the same
  * code path WITHOUT the fallback: a compile failure here throws, so this
  * suite fails loudly if any of these types regresses to a
  * codegen-hostile shape. */
class StateEncoderCodegenSpec extends AnyFunSuite with Matchers {

  private def assertCodegens[T <: Product: TypeTag](name: String): Unit = {
    val enc = ExpressionEncoder[T]()
    val proj = GenerateUnsafeProjection.generate(enc.serializer) // throws on Janino failure
    proj should not be null
  }

  test("ValueState record types codegen-compile (no interpreter fallback)") {
    assertCodegens[LastEvent]("LastEvent")
    assertCodegens[EwmaState]("EwmaState")
    assertCodegens[CusumState]("CusumState")
    assertCodegens[TouchState]("TouchState")
    assertCodegens[EventStreams.RunningTotal]("RunningTotal")
    assertCodegens[EventStreams.SessionState]("SessionState")
  }

  test("emitted row types codegen-compile") {
    assertCodegens[EventStreams.Transition]("Transition")
    assertCodegens[EventStreams.EwmaPoint]("EwmaPoint")
    assertCodegens[EventStreams.CusumPoint]("CusumPoint")
    assertCodegens[EventStreams.AttributionPoint]("AttributionPoint")
    assertCodegens[EventStreams.Session]("Session")
    assertCodegens[EventStreams.TypedEv]("TypedEv")
    assertCodegens[EventStreams.ValEv]("ValEv")
    assertCodegens[EventStreams.Ev]("Ev")
  }
}
