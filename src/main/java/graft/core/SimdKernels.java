package graft.core;

import jdk.incubator.vector.FloatVector;
import jdk.incubator.vector.VectorSpecies;

/**
 * SIMD (jdk.incubator.vector) GEMV kernels for the Pyramid fp32 inference
 * engine, vectorized ACROSS OUTPUT LANES over TRANSPOSED weights.
 *
 * Bit-exactness contract (the whole point of this layout): for every output
 * element o the accumulation sequence is IDENTICAL to the scalar kernels in
 * {@link Nn} / {@link LstmCell} / {@link Conv2Tap} — bias first, then input
 * index i ascending, one rounded multiply followed by one rounded add per
 * term (never fused: {@code mul(..).add(..)}, not {@code fma}). Each SIMD
 * lane owns one output element, so vectorizing across lanes reorders nothing
 * within a lane. IEEE-754 addition is commutative, so {@code term.add(acc)}
 * equals {@code acc.add(term)} bitwise. NnSimdSpec asserts exact equality
 * against the scalar kernels across shapes including remainder tails.
 *
 * Weight transposes (wT[i*outDim + o] = w[o*inDim + i]) are pure copies —
 * no arithmetic — prepared once per weight object (see Nn.scala lazy vals).
 */
public final class SimdKernels {
    // NOTE: no class-level fields of Vector API types — sbt/zinc's API
    // analysis reflectively loads this class after javac and a
    // VectorSpecies-typed field makes it pull jdk.incubator.vector classes
    // through a classloader that cannot access them (IllegalAccessError at
    // build time). Each method takes the species as a local instead; the
    // static-final SPECIES_PREFERRED lookup is constant-folded by the JIT.

    private SimdKernels() {}

    /** Class-load probe: callers catch NoClassDefFoundError / throwable when
     *  the incubator module is absent and fall back to the scalar kernels. */
    public static int probe() {
        VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;
        float[] one = new float[S.length()];
        FloatVector.zero(S).intoArray(one, 0);
        return S.length();
    }

    /**
     * y[yOff+o] = b[o] + sum_i x[xOff+i] * wT[i*outDim + o], o in [0, outDim).
     * Matches Nn.dense's per-row order (bias, then i ascending) bit-exactly.
     */
    public static void gemvT(float[] wT, float[] b, int inDim, int outDim,
                             float[] x, int xOff, float[] y, int yOff) {
        final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;
        final int L = S.length();
        int o = 0;
        for (; o + 4 * L <= outDim; o += 4 * L) {
            FloatVector a0 = FloatVector.fromArray(S, b, o);
            FloatVector a1 = FloatVector.fromArray(S, b, o + L);
            FloatVector a2 = FloatVector.fromArray(S, b, o + 2 * L);
            FloatVector a3 = FloatVector.fromArray(S, b, o + 3 * L);
            for (int i = 0; i < inDim; i++) {
                FloatVector xv = FloatVector.broadcast(S, x[xOff + i]);
                int w = i * outDim + o;
                a0 = FloatVector.fromArray(S, wT, w).mul(xv).add(a0);
                a1 = FloatVector.fromArray(S, wT, w + L).mul(xv).add(a1);
                a2 = FloatVector.fromArray(S, wT, w + 2 * L).mul(xv).add(a2);
                a3 = FloatVector.fromArray(S, wT, w + 3 * L).mul(xv).add(a3);
            }
            a0.intoArray(y, yOff + o);
            a1.intoArray(y, yOff + o + L);
            a2.intoArray(y, yOff + o + 2 * L);
            a3.intoArray(y, yOff + o + 3 * L);
        }
        for (; o + L <= outDim; o += L) {
            FloatVector a0 = FloatVector.fromArray(S, b, o);
            for (int i = 0; i < inDim; i++) {
                FloatVector xv = FloatVector.broadcast(S, x[xOff + i]);
                a0 = FloatVector.fromArray(S, wT, i * outDim + o).mul(xv).add(a0);
            }
            a0.intoArray(y, yOff + o);
        }
        for (; o < outDim; o++) {
            float acc = b[o];
            for (int i = 0; i < inDim; i++) acc += wT[i * outDim + o] * x[xOff + i];
            y[yOff + o] = acc;
        }
    }

    /**
     * Accumulating variant of {@link #gemvT}: y[yOff+o] += sum_i x[xOff+i] *
     * wT[i*outDim + o] — the initial accumulator is loaded FROM y, so a
     * caller can chain phases (bias-init via gemvT, then accumulate another
     * matvec) while preserving each output's scalar accumulation order.
     */
    public static void gemvAccT(float[] wT, int inDim, int outDim,
                                float[] x, int xOff, float[] y, int yOff) {
        final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;
        final int L = S.length();
        int o = 0;
        for (; o + 4 * L <= outDim; o += 4 * L) {
            FloatVector a0 = FloatVector.fromArray(S, y, yOff + o);
            FloatVector a1 = FloatVector.fromArray(S, y, yOff + o + L);
            FloatVector a2 = FloatVector.fromArray(S, y, yOff + o + 2 * L);
            FloatVector a3 = FloatVector.fromArray(S, y, yOff + o + 3 * L);
            for (int i = 0; i < inDim; i++) {
                FloatVector xv = FloatVector.broadcast(S, x[xOff + i]);
                int w = i * outDim + o;
                a0 = FloatVector.fromArray(S, wT, w).mul(xv).add(a0);
                a1 = FloatVector.fromArray(S, wT, w + L).mul(xv).add(a1);
                a2 = FloatVector.fromArray(S, wT, w + 2 * L).mul(xv).add(a2);
                a3 = FloatVector.fromArray(S, wT, w + 3 * L).mul(xv).add(a3);
            }
            a0.intoArray(y, yOff + o);
            a1.intoArray(y, yOff + o + L);
            a2.intoArray(y, yOff + o + 2 * L);
            a3.intoArray(y, yOff + o + 3 * L);
        }
        for (; o + L <= outDim; o += L) {
            FloatVector a0 = FloatVector.fromArray(S, y, yOff + o);
            for (int i = 0; i < inDim; i++) {
                FloatVector xv = FloatVector.broadcast(S, x[xOff + i]);
                a0 = FloatVector.fromArray(S, wT, i * outDim + o).mul(xv).add(a0);
            }
            a0.intoArray(y, yOff + o);
        }
        for (; o < outDim; o++) {
            float acc = y[yOff + o];
            for (int i = 0; i < inDim; i++) acc += wT[i * outDim + o] * x[xOff + i];
            y[yOff + o] = acc;
        }
    }

    /**
     * One LSTM step's gate pre-activations:
     * gates[j] = bSum[j] + sum_i wIhT[i][j]*x[xo+i] + sum_k wHhT[k][j]*h[k],
     * j in [0, 4H). bSum[j] must be the precomputed bIh[j]+bHh[j] (the scalar
     * kernel computes that sum first too). Accumulator stays in registers
     * across both matvecs, preserving the scalar kernel's per-gate order.
     */
    public static void lstmGates(float[] wIhT, float[] wHhT, float[] bSum,
                                 int inDim, int hidden,
                                 float[] x, int xo, float[] h, float[] gates) {
        final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;
        final int L = S.length();
        int out = 4 * hidden;
        int j = 0;
        for (; j + 4 * L <= out; j += 4 * L) {
            FloatVector a0 = FloatVector.fromArray(S, bSum, j);
            FloatVector a1 = FloatVector.fromArray(S, bSum, j + L);
            FloatVector a2 = FloatVector.fromArray(S, bSum, j + 2 * L);
            FloatVector a3 = FloatVector.fromArray(S, bSum, j + 3 * L);
            for (int i = 0; i < inDim; i++) {
                FloatVector xv = FloatVector.broadcast(S, x[xo + i]);
                int w = i * out + j;
                a0 = FloatVector.fromArray(S, wIhT, w).mul(xv).add(a0);
                a1 = FloatVector.fromArray(S, wIhT, w + L).mul(xv).add(a1);
                a2 = FloatVector.fromArray(S, wIhT, w + 2 * L).mul(xv).add(a2);
                a3 = FloatVector.fromArray(S, wIhT, w + 3 * L).mul(xv).add(a3);
            }
            for (int k = 0; k < hidden; k++) {
                FloatVector hv = FloatVector.broadcast(S, h[k]);
                int w = k * out + j;
                a0 = FloatVector.fromArray(S, wHhT, w).mul(hv).add(a0);
                a1 = FloatVector.fromArray(S, wHhT, w + L).mul(hv).add(a1);
                a2 = FloatVector.fromArray(S, wHhT, w + 2 * L).mul(hv).add(a2);
                a3 = FloatVector.fromArray(S, wHhT, w + 3 * L).mul(hv).add(a3);
            }
            a0.intoArray(gates, j);
            a1.intoArray(gates, j + L);
            a2.intoArray(gates, j + 2 * L);
            a3.intoArray(gates, j + 3 * L);
        }
        for (; j + L <= out; j += L) {
            FloatVector a0 = FloatVector.fromArray(S, bSum, j);
            for (int i = 0; i < inDim; i++) {
                FloatVector xv = FloatVector.broadcast(S, x[xo + i]);
                a0 = FloatVector.fromArray(S, wIhT, i * out + j).mul(xv).add(a0);
            }
            for (int k = 0; k < hidden; k++) {
                FloatVector hv = FloatVector.broadcast(S, h[k]);
                a0 = FloatVector.fromArray(S, wHhT, k * out + j).mul(hv).add(a0);
            }
            a0.intoArray(gates, j);
        }
        for (; j < out; j++) {
            float acc = bSum[j];
            for (int i = 0; i < inDim; i++) acc += wIhT[i * out + j] * x[xo + i];
            for (int k = 0; k < hidden; k++) acc += wHhT[k * out + j] * h[k];
            gates[j] = acc;
        }
    }

    /**
     * One conv-k2 output position:
     * y[yo+o] = b[o] + sum_i (w0T[i][o]*xa[i] + w1T[i][o]*xb[i]),
     * with the scalar kernel's exact order — per i, the two tap products are
     * summed together FIRST, then added to the accumulator (`a += p0 + p1`
     * means a = a + (p0 + p1): the compound-assignment RHS evaluates whole).
     */
    public static void conv2(float[] w0T, float[] w1T, float[] b, int inCh, int outCh,
                             float[] x, int x0, int x1, float[] y, int yo) {
        final VectorSpecies<Float> S = FloatVector.SPECIES_PREFERRED;
        final int L = S.length();
        int o = 0;
        for (; o + 4 * L <= outCh; o += 4 * L) {
            FloatVector a0 = FloatVector.fromArray(S, b, o);
            FloatVector a1 = FloatVector.fromArray(S, b, o + L);
            FloatVector a2 = FloatVector.fromArray(S, b, o + 2 * L);
            FloatVector a3 = FloatVector.fromArray(S, b, o + 3 * L);
            for (int i = 0; i < inCh; i++) {
                FloatVector xa = FloatVector.broadcast(S, x[x0 + i]);
                FloatVector xb = FloatVector.broadcast(S, x[x1 + i]);
                int w = i * outCh + o;
                a0 = FloatVector.fromArray(S, w0T, w).mul(xa)
                        .add(FloatVector.fromArray(S, w1T, w).mul(xb)).add(a0);
                a1 = FloatVector.fromArray(S, w0T, w + L).mul(xa)
                        .add(FloatVector.fromArray(S, w1T, w + L).mul(xb)).add(a1);
                a2 = FloatVector.fromArray(S, w0T, w + 2 * L).mul(xa)
                        .add(FloatVector.fromArray(S, w1T, w + 2 * L).mul(xb)).add(a2);
                a3 = FloatVector.fromArray(S, w0T, w + 3 * L).mul(xa)
                        .add(FloatVector.fromArray(S, w1T, w + 3 * L).mul(xb)).add(a3);
            }
            a0.intoArray(y, yo + o);
            a1.intoArray(y, yo + o + L);
            a2.intoArray(y, yo + o + 2 * L);
            a3.intoArray(y, yo + o + 3 * L);
        }
        for (; o + L <= outCh; o += L) {
            FloatVector a0 = FloatVector.fromArray(S, b, o);
            for (int i = 0; i < inCh; i++) {
                int w = i * outCh + o;
                a0 = FloatVector.fromArray(S, w0T, w).mul(FloatVector.broadcast(S, x[x0 + i]))
                        .add(FloatVector.fromArray(S, w1T, w).mul(FloatVector.broadcast(S, x[x1 + i])))
                        .add(a0);
            }
            a0.intoArray(y, yo + o);
        }
        for (; o < outCh; o++) {
            float acc = b[o];
            for (int i = 0; i < inCh; i++)
                acc += w0T[i * outCh + o] * x[x0 + i] + w1T[i * outCh + o] * x[x1 + i];
            y[yo + o] = acc;
        }
    }
}
