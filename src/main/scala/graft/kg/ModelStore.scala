package graft.kg

import java.io.{ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import graft.core.{LabelCodec, PyramidWeights, WordVocab}

/** S11 — model save/load (`model.py:231-307`): the reference persists a yaml
  * config + lexicon files + a torch state_dict; here the versioned model dir
  * holds a manifest, the word lexicon and kind list as plain text, and the
  * weights. Loading happens once on the driver and the bundle is broadcast —
  * the model is dictionary-sized, never corpus-sized.
  */
object ModelStore {

  val Version = 1

  def save(dir: Path, model: Mentions.Model): Unit = {
    Files.createDirectories(dir)
    Files.write(dir.resolve("manifest.json"),
      s"""{"version":$Version,"vocab_size":${model.vocab.size},"kinds":${model.codec.entities.length}}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("lexicon.txt"),
      model.vocab.lexicon.toSeq.asJava, StandardCharsets.UTF_8)
    Files.write(dir.resolve("kinds.txt"),
      model.codec.entities.toSeq.asJava, StandardCharsets.UTF_8)
    val out = new ObjectOutputStream(Files.newOutputStream(dir.resolve("weights.bin")))
    try out.writeObject(model.weights) finally out.close()
  }

  def load(dir: Path): Mentions.Model = {
    val manifest = new String(Files.readAllBytes(dir.resolve("manifest.json")), StandardCharsets.UTF_8)
    require(manifest.contains(s""""version":$Version"""),
      s"unsupported model version in $manifest")
    val lexicon = Files.readAllLines(dir.resolve("lexicon.txt"), StandardCharsets.UTF_8)
      .asScala.toArray
    val kinds = Files.readAllLines(dir.resolve("kinds.txt"), StandardCharsets.UTF_8)
      .asScala.toSeq
    val in = new ObjectInputStream(Files.newInputStream(dir.resolve("weights.bin")))
    val weights = try in.readObject().asInstanceOf[PyramidWeights] finally in.close()
    Mentions.Model(weights, new WordVocab(lexicon), new LabelCodec(kinds))
  }
}
