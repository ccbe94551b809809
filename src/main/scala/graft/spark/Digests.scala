package graft.spark

/** Shared per-thread MD5 instance for the native kernels ([[Md5Words]],
  * [[SimHash32]]): MessageDigest is not thread-safe and allocation per
  * row would dominate the kernels' cost.
  */
private[spark] object Digests {
  val md5: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
}
