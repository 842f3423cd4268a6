package graft
object HeapCheck {
  def main(args: Array[String]): Unit =
    println(s"MAXHEAP_GiB=${Runtime.getRuntime.maxMemory.toDouble / (1L<<30)}")
}
