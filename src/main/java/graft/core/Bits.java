package graft.core;

import java.lang.invoke.MethodHandles;
import java.lang.invoke.VarHandle;
import java.nio.ByteOrder;

/**
 * Little-endian word access over byte arrays. Lives in Java because the JIT
 * only fully inlines VarHandle accessors rooted in a static final field —
 * a Scala object val compiles to an instance field and every call goes
 * through VarHandleGuards (visible in profiles as LambdaForm$MH frames).
 */
public final class Bits {
    private static final VarHandle LE_LONG =
        MethodHandles.byteArrayViewVarHandle(long[].class, ByteOrder.LITTLE_ENDIAN);

    private Bits() {}

    /** load 8 little-endian bytes at pos (caller guarantees pos+8 <= len) */
    public static long loadLongLE(byte[] data, int pos) {
        return (long) LE_LONG.get(data, pos);
    }

    /** store 8 little-endian bytes at pos (caller guarantees pos+8 <= len) */
    public static void storeLongLE(byte[] data, int pos, long v) {
        LE_LONG.set(data, pos, v);
    }

    /** splitmix64 — public-domain mixer (Steele et al., JDK SplittableRandom). */
    public static long mix(long x0) {
        long x = x0 + 0x9e3779b97f4a7c15L;
        x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L;
        x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL;
        return x ^ (x >>> 31);
    }
}
